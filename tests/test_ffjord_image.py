"""FFJORD image-stack completion (VERDICT r1 missing #2/#3): gated layers,
glow BruteForceLayer, resnet blocks, ODENVP sampling/inverse, and the
gas/hepmass/bsds300 MAF loaders (on synthetic stand-in files)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu.ffjord.layers import GatedConv, GatedConvTranspose, GatedLinear
from pnode_tpu.ffjord.other_flows import BruteForceLayer
from pnode_tpu.ffjord.resnet import BasicBlock, ResNeXtBottleneck


def test_gated_layers_shapes_and_gating():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 7))
    layer = GatedLinear(dim_out=5)
    p = layer.init(key, x)
    y = layer.apply(p, x)
    assert y.shape == (4, 5)
    # gate structure: with the gate net's output pushed to -inf the layer
    # output vanishes (f * sigmoid(g))
    p2 = jax.tree_util.tree_map(lambda a: a, p)
    p2 = jax.tree_util.tree_map(lambda a: a, p2)
    import flax

    p2 = flax.core.unfreeze(p2) if hasattr(flax.core, "unfreeze") else dict(p2)
    # identify the gate Dense (second Dense submodule)
    names = sorted(p2["params"].keys())
    gate = names[1]
    p2["params"][gate]["bias"] = -1e9 * jnp.ones_like(
        p2["params"][gate]["bias"]
    )
    p2["params"][gate]["kernel"] = jnp.zeros_like(
        p2["params"][gate]["kernel"]
    )
    y0 = layer.apply(p2, x)
    np.testing.assert_allclose(np.asarray(y0), 0.0, atol=1e-12)

    ximg = jax.random.normal(key, (2, 8, 8, 3))
    conv = GatedConv(dim_out=6)
    pc = conv.init(key, ximg)
    assert conv.apply(pc, ximg).shape == (2, 8, 8, 6)
    convt = GatedConvTranspose(dim_out=6, stride=2)
    pt = convt.init(key, ximg)
    assert convt.apply(pt, ximg).shape == (2, 16, 16, 6)


def test_brute_force_layer_logdet_and_inverse():
    key = jax.random.PRNGKey(1)
    dim = 5
    layer = BruteForceLayer(dim)
    x = jax.random.normal(key, (6, dim))
    params = layer.init(key, x)
    # non-trivial weight
    W = jnp.eye(dim) + 0.3 * jax.random.normal(key, (dim, dim))
    params = {"weight": W}
    delta0 = jnp.zeros((6, 1))
    y, delta, _ = layer.apply(params, x, delta0, {})
    # exact log-det
    np.testing.assert_allclose(
        np.asarray(delta[:, 0]),
        -np.linalg.slogdet(np.asarray(W))[1] * np.ones(6),
        rtol=1e-6,
    )
    # round trip restores x and cancels delta
    x2, delta2, _ = layer.apply(params, y, delta, {}, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(delta2), 0.0, atol=1e-6)


def test_resnet_blocks():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 8, 8, 4))
    blk = BasicBlock(dim=4)
    p = blk.init(key, x)
    assert blk.apply(p, x).shape == x.shape

    bn_blk = ResNeXtBottleneck(dim=4, cardinality=2, base_depth=8)
    variables = bn_blk.init(key, x, training=True)
    y, new_state = bn_blk.apply(variables, x, training=True,
                                mutable=["batch_stats"])
    assert y.shape == x.shape
    y_eval = bn_blk.apply(
        {"params": variables["params"], "batch_stats": new_state["batch_stats"]},
        x, training=False,
    )
    assert y_eval.shape == x.shape


def test_odenvp_inverse_roundtrip_and_sampling():
    from pnode_tpu.ffjord.odenvp import ODENVP, standard_normal_logprob

    key = jax.random.PRNGKey(3)
    model = ODENVP((4, 4, 1), n_scales=2, n_blocks=1, hidden_dims=(4,),
                   step_size=0.25)
    x = jax.random.uniform(key, (2, 4, 4, 1), minval=0.05, maxval=0.95)
    params = model.init(key, x)

    # exact-divergence forward then inverse must reconstruct x
    zs, delta = model.forward(params, x, key=None, training=False)
    x2, delta_rev = model.inverse(params, zs, key=None)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4,
                               atol=1e-5)
    # delta_rev = -delta_fwd: log-density consistent both ways
    np.testing.assert_allclose(np.asarray(delta_rev), -np.asarray(delta),
                               rtol=1e-4, atol=1e-5)
    logpx, _ = model.log_prob(params, x, key=None, training=False)
    logpx_via_inverse = (
        sum(standard_normal_logprob(z) for z in zs)[:, None] + delta_rev
    )
    np.testing.assert_allclose(np.asarray(logpx_via_inverse),
                               np.asarray(logpx), rtol=1e-4, atol=1e-4)

    # sampling produces finite images of the right shape
    samples = model.sample(params, key, 3)
    assert samples.shape == (3, 4, 4, 1)
    assert np.all(np.isfinite(np.asarray(samples)))


def test_multiscale_parallel_inverse_roundtrip():
    from pnode_tpu.ffjord.odenvp import MultiscaleParallelCNF

    key = jax.random.PRNGKey(4)
    model = MultiscaleParallelCNF((4, 4, 1), n_blocks=1,
                                  intermediate_dims=(4,), alpha=0.05,
                                  step_size=0.25, time_length=0.5)
    x = jax.random.uniform(key, (2, 4, 4, 1), minval=0.05, maxval=0.95)
    params = model.init(key, x)
    logpx, z = model.log_prob(params, x, key=None, training=False)
    x2, _ = model.inverse(params, z, key=None)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4,
                               atol=1e-5)
    samples = model.sample(params, key, 2)
    assert samples.shape == (2, 4, 4, 1)


# ---------------------------------------------------------------------------
# MAF loaders on synthetic stand-in files
# ---------------------------------------------------------------------------


def test_gas_loader_preprocessing(tmp_path):
    pd = pytest.importorskip("pandas")
    from pnode_tpu.ffjord.datasets import load_tabular

    rng = np.random.default_rng(0)
    n = 400
    base = rng.normal(size=(n, 4))
    df = pd.DataFrame({
        "Time": np.arange(n, dtype=float),
        "Meth": rng.normal(size=n),
        "Eth": rng.normal(size=n),
        "A": base[:, 0],
        "B": base[:, 1],
        # C is ~perfectly correlated with A -> must be pruned
        "C": base[:, 0] * 1.0000001 + 1e-9,
        "D": base[:, 2],
        "E": base[:, 3],
    })
    os.makedirs(tmp_path / "gas", exist_ok=True)
    df.to_pickle(tmp_path / "gas" / "ethylene_CO.pickle")
    data = load_tabular("gas", root=str(tmp_path))
    assert not data.synthetic
    # Time/Meth/Eth dropped; one of the correlated pair pruned -> 4 features
    assert data.dim == 4
    full = np.concatenate([data.trn, data.val, data.tst])
    np.testing.assert_allclose(full.mean(0), 0.0, atol=0.05)
    np.testing.assert_allclose(full.std(0), 1.0, atol=0.05)
    assert len(data.tst) == int(0.1 * n)


def test_hepmass_loader_preprocessing(tmp_path):
    pd = pytest.importorskip("pandas")
    from pnode_tpu.ffjord.datasets import load_tabular

    rng = np.random.default_rng(1)
    n = 300
    label = rng.integers(0, 2, n)
    feats = {f"f{i}": rng.normal(size=n) for i in range(5)}
    # a discrete-valued feature (many repeats of its smallest value) that
    # the count filter must remove; needs nonzero variance so z-scoring
    # stays finite
    feats["f5"] = np.where(rng.random(n) < 0.7, 0.0, 1.0)
    df_tr = pd.DataFrame({"# label": label, **feats})
    df_te = pd.DataFrame({"# label": label, **feats,
                          "stray": np.zeros(n)})
    os.makedirs(tmp_path / "hepmass", exist_ok=True)
    df_tr.to_csv(tmp_path / "hepmass" / "1000_train.csv", index=False)
    df_te.to_csv(tmp_path / "hepmass" / "1000_test.csv", index=False)
    data = load_tabular("hepmass", root=str(tmp_path))
    assert not data.synthetic
    assert data.dim == 5  # label dropped, f5 filtered, stray dropped
    n_pos = int((label == 1).sum())
    assert len(data.trn) + len(data.val) == n_pos
    np.testing.assert_allclose(
        np.concatenate([data.trn, data.val]).mean(0), 0.0, atol=0.05
    )


def test_bsds300_loader(tmp_path):
    h5py = pytest.importorskip("h5py")
    from pnode_tpu.ffjord.datasets import load_tabular

    rng = np.random.default_rng(2)
    os.makedirs(tmp_path / "BSDS300", exist_ok=True)
    with h5py.File(tmp_path / "BSDS300" / "BSDS300.hdf5", "w") as f:
        f["train"] = rng.normal(size=(100, 63)).astype(np.float32)
        f["validation"] = rng.normal(size=(20, 63)).astype(np.float32)
        f["test"] = rng.normal(size=(30, 63)).astype(np.float32)
    data = load_tabular("bsds300", root=str(tmp_path))
    assert not data.synthetic
    assert data.dim == 63
    assert (len(data.trn), len(data.val), len(data.tst)) == (100, 20, 30)


def test_all_five_names_resolve():
    from pnode_tpu.ffjord.datasets import DATA_DIMS, load_tabular

    for name in DATA_DIMS:
        d = load_tabular(name, root="/nonexistent")
        assert d.synthetic and d.dim == DATA_DIMS[name]
