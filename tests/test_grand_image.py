"""GRAND image-GNN (pixel-grid diffusion) + heterophilic loader tests.

References: /root/reference/examples-sinode/grand/src/GNN_image.py,
data_image.py edge_index_calc:69-179, heterophilic.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu.models.grand_image import GRANDImage, grid_edge_index


@pytest.mark.parametrize("H,W", [(4, 4), (5, 3), (8, 8)])
def test_grid_edge_counts(H, W):
    """Edge counts match the reference's asserted formulas
    (data_image.py:165-179): 2*(2HW - H - W) without diagonals, plus
    4*(H-1)*(W-1) with."""
    e = grid_edge_index(H, W, diags=False)
    assert e.shape[1] == 2 * (2 * H * W - H - W)
    ed = grid_edge_index(H, W, diags=True)
    assert ed.shape[1] == 2 * (2 * H * W - H - W) + 4 * (H - 1) * (W - 1)
    # both directions present, no self loops
    s = {(int(a), int(b)) for a, b in ed.T}
    assert all((b, a) in s for a, b in s)
    assert all(a != b for a, b in s)


def test_grand_image_trains():
    """Diffusion classifier learns a quadrant-blob task: accuracy above
    chance and falling loss (the reference trains MNIST the same way —
    raw pixels diffuse, one Linear decodes)."""
    import optax

    H = W = 8
    n_cls = 4
    rng = np.random.default_rng(0)
    B = 64
    ys = rng.integers(0, n_cls, size=B)
    xs = np.zeros((B, H, W, 1), np.float32)
    for i, c in enumerate(ys):
        oy, ox = (c // 2) * 4, (c % 2) * 4
        xs[i, oy + 1: oy + 3, ox + 1: ox + 3, 0] = 1.0
    xs += rng.normal(scale=0.15, size=xs.shape).astype(np.float32)
    x, y = jnp.asarray(xs), jnp.asarray(ys)

    model = GRANDImage(H, W, n_cls, T=1.0, step_size=0.25, method="rk4",
                       input_dropout=0.0, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(5e-2)
    s = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss(pp):
            logits = model.apply(pp, x, training=True,
                                 rng=jax.random.PRNGKey(1))
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y))

        l, g = jax.value_and_grad(loss)(p)
        u, s2 = opt.update(g, s)
        return optax.apply_updates(p, u), s2, l

    losses = []
    for _ in range(60):
        params, s, l = step(params, s)
        losses.append(float(l))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.5
    logits = model.apply(params, x, training=False)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == y))
    assert acc > 0.5, acc


def test_heterophilic_loader(tmp_path):
    """Geom-GCN raw-format round trip: dense (WebKB-style) and index
    multi-hot (film) feature parsing, undirected+coalesced edges, npz
    split masks."""
    from pnode_tpu.models.grand import load_heterophilic

    d = tmp_path / "cornell"
    os.makedirs(d)
    with open(d / "out1_node_feature_label.txt", "w") as f:
        f.write("node_id\tfeature\tlabel\n")
        f.write("0\t1,0,1\t0\n1\t0,1,0\t1\n2\t1,1,0\t2\n3\t0,0,1\t1\n")
    with open(d / "out1_graph_edges.txt", "w") as f:
        # duplicate edge + self loop to exercise coalesce/removal
        f.write("src\tdst\n0\t1\n1\t0\n1\t2\n2\t3\n2\t2\n1\t2\n")
    np.savez(d / "cornell_split_0.6_0.2_0.npz",
             train_mask=np.array([1, 1, 0, 0], bool),
             val_mask=np.array([0, 0, 1, 0], bool),
             test_mask=np.array([0, 0, 0, 1], bool))
    data = load_heterophilic(str(tmp_path), "cornell", split=0)
    assert data["x"].shape == (4, 3)
    np.testing.assert_array_equal(data["y"], [0, 1, 2, 1])
    e = {(int(a), int(b)) for a, b in data["edge_index"].T}
    assert e == {(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)}
    assert data["train_mask"].sum() == 2

    # film: feature field = active keyword indices
    d2 = tmp_path / "film"
    os.makedirs(d2)
    with open(d2 / "out1_node_feature_label.txt", "w") as f:
        f.write("node_id\tfeature\tlabel\n")
        f.write("0\t3,10\t4\n1\t0\t2\n")
    with open(d2 / "out1_graph_edges.txt", "w") as f:
        f.write("src\tdst\n0\t1\n")
    np.savez(d2 / "film_split_0.6_0.2_0.npz",
             train_mask=np.array([1, 0], bool),
             val_mask=np.array([0, 1], bool),
             test_mask=np.array([0, 0], bool))
    data = load_heterophilic(str(tmp_path), "film", split=0)
    assert data["x"].shape == (2, 932)
    assert data["x"][0, 3] == 1.0 and data["x"][0, 10] == 1.0
    assert data["x"].sum() == 3.0
    np.testing.assert_array_equal(data["y"], [4, 2])
