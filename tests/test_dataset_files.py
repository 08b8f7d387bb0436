"""File-format dataset loaders against synthetic files written in the REAL
on-disk formats (the actual archives need network egress): MNIST IDX,
Planetoid ind.* pickles. The MAF tabular loaders have their own tests."""

import gzip
import os
import pickle
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_mnist_idx_loader(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (7, 28, 28), dtype=np.uint8)
    raw = struct.pack(">IIII", 0x803, 7, 28, 28) + imgs.tobytes()
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(raw)

    import importlib

    sys.argv = ["ffjord_image", "--cpu"]
    mod = importlib.import_module("ffjord_image")
    x = mod.load_mnist_idx(str(tmp_path))
    assert x.shape == (7, 28, 28, 1)
    np.testing.assert_array_equal(x[..., 0], imgs)
    # load_images routes through the IDX path
    x2, synthetic = mod.load_images("mnist", str(tmp_path))
    assert not synthetic and x2.shape == (7, 28, 28, 1)


def test_planetoid_loader(tmp_path):
    from pnode_tpu.models.grand import load_planetoid

    rng = np.random.default_rng(1)
    n_train, n_extra, n_test, f, c = 6, 8, 4, 5, 3
    n = n_train + n_extra + n_test
    x = rng.normal(size=(n_train, f)).astype(np.float32)
    allx = np.concatenate(
        [x, rng.normal(size=(n_extra, f)).astype(np.float32)]
    )
    tx = rng.normal(size=(n_test, f)).astype(np.float32)

    def onehot(k):
        lab = rng.integers(0, c, k)
        out = np.zeros((k, c), np.int64)
        out[np.arange(k), lab] = 1
        return out

    y = onehot(n_train)
    ally = np.concatenate([y, onehot(n_extra)])
    ty = onehot(n_test)
    graph = {i: [int(j) for j in rng.integers(0, n, 2)] for i in range(n)}
    # test indices permuted, as in the real files
    test_idx = np.arange(n_train + n_extra, n)
    rng.shuffle(test_idx)

    parts = {"x": x, "tx": tx, "allx": allx, "y": y, "ty": ty,
             "ally": ally, "graph": graph}
    for part, obj in parts.items():
        with open(tmp_path / f"ind.cora.{part}", "wb") as fh:
            pickle.dump(obj, fh)
    np.savetxt(tmp_path / "ind.cora.test.index", test_idx, fmt="%d")

    data = load_planetoid(str(tmp_path), "cora")
    assert data["x"].shape == (n, f)
    assert data["y"].shape == (n,)
    # permuted test rows restored to their true positions
    order = np.sort(test_idx)
    np.testing.assert_allclose(data["x"][order],
                               tx[np.argsort(test_idx)], rtol=1e-6)
    assert data["train_mask"].sum() == n_train
    assert data["test_mask"].sum() == n_test
    assert data["edge_index"].shape[0] == 2
    assert not (data["train_mask"] & data["test_mask"]).any()


def test_planetoid_loader_citeseer_gapped_index(tmp_path):
    """citeseer's test.index has GAPS (isolated nodes): max(test_idx) exceeds
    allx.rows + tx.rows. The loader must zero-extend over the index range
    (the original Planetoid tx_extended patching) instead of crashing."""
    from pnode_tpu.models.grand import load_planetoid

    rng = np.random.default_rng(2)
    n_train, n_extra, n_test, f, c = 5, 7, 4, 6, 3
    base = n_train + n_extra
    x = rng.normal(size=(n_train, f)).astype(np.float32)
    allx = np.concatenate(
        [x, rng.normal(size=(n_extra, f)).astype(np.float32)]
    )
    tx = rng.normal(size=(n_test, f)).astype(np.float32)

    def onehot(k):
        lab = rng.integers(0, c, k)
        out = np.zeros((k, c), np.int64)
        out[np.arange(k), lab] = 1
        return out

    y = onehot(n_train)
    ally = np.concatenate([y, onehot(n_extra)])
    ty = onehot(n_test)
    # gapped: indices {base, base+2, base+3, base+6} — base+1/+4/+5 isolated
    test_idx = np.asarray([base, base + 2, base + 3, base + 6])
    n_full = base + 7  # index range [base, base+6]
    graph = {i: [int(j) for j in rng.integers(0, n_full, 2)]
             for i in range(n_full)}
    rng.shuffle(test_idx)

    parts = {"x": x, "tx": tx, "allx": allx, "y": y, "ty": ty,
             "ally": ally, "graph": graph}
    for part, obj in parts.items():
        with open(tmp_path / f"ind.citeseer.{part}", "wb") as fh:
            pickle.dump(obj, fh)
    np.savetxt(tmp_path / "ind.citeseer.test.index", test_idx, fmt="%d")

    data = load_planetoid(str(tmp_path), "citeseer")
    assert data["x"].shape == (n_full, f)
    # real test rows at their true positions; isolated nodes zero rows
    np.testing.assert_allclose(data["x"][test_idx], tx, rtol=1e-6)
    np.testing.assert_array_equal(data["x"][base + 1], np.zeros(f))
    assert data["test_mask"].sum() == n_test
    assert not data["test_mask"][base + 1]


def _write_heterophilic(base, feats_field, labels, edges):
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "out1_node_feature_label.txt"), "w") as f:
        f.write("node_id\tfeature\tlabel\n")
        for i, (fs, lab) in enumerate(zip(feats_field, labels)):
            f.write(f"{i}\t{fs}\t{lab}\n")
    with open(os.path.join(base, "out1_graph_edges.txt"), "w") as f:
        f.write("src\tdst\n")
        for a, b in edges:
            f.write(f"{a}\t{b}\n")


def test_heterophilic_loader_dense(tmp_path):
    """Geom-GCN raw dump round-trip: dense features, undirected coalesce,
    self-loop drop, split masks (reference heterophilic.py WebKB)."""
    from pnode_tpu.models.grand import load_heterophilic

    n, f = 5, 3
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(n, f)).astype(np.float32)
    labels = rng.integers(0, 2, n)
    field = [",".join(f"{v:.6f}" for v in row) for row in feats]
    # duplicate edge (0,1)+(1,0) and a self loop (2,2)
    _write_heterophilic(str(tmp_path / "cornell"), field, labels,
                        [(0, 1), (1, 0), (2, 2), (3, 4)])
    tr = np.zeros(n, bool); tr[:3] = True
    va = np.zeros(n, bool); va[3] = True
    te = np.zeros(n, bool); te[4] = True
    np.savez(tmp_path / "cornell" / "cornell_split_0.6_0.2_0.npz",
             train_mask=tr, val_mask=va, test_mask=te)

    d = load_heterophilic(str(tmp_path), "cornell", split=0)
    np.testing.assert_allclose(d["x"], feats, rtol=1e-5)
    np.testing.assert_array_equal(d["y"], labels)
    ei = d["edge_index"]
    assert ei.shape == (2, 4)  # {0-1,1-0,3-4,4-3}: coalesced, no self loop
    assert not np.any(ei[0] == ei[1])
    pairs = set(map(tuple, ei.T.tolist()))
    assert pairs == {(0, 1), (1, 0), (3, 4), (4, 3)}
    np.testing.assert_array_equal(d["train_mask"], tr)
    np.testing.assert_array_equal(d["test_mask"], te)


def test_heterophilic_loader_film_multihot(tmp_path):
    """film/actor stores ACTIVE keyword indices -> 932-dim multi-hot
    (reference heterophilic.py:76-90)."""
    from pnode_tpu.models.grand import load_heterophilic

    field = ["0,5,931", "7"]
    _write_heterophilic(str(tmp_path / "film"), field, [1, 3],
                        [(0, 1)])
    tr = np.array([True, False]); te = ~tr
    np.savez(tmp_path / "film" / "film_split_0.6_0.2_3.npz",
             train_mask=tr, val_mask=np.zeros(2, bool), test_mask=te)

    d = load_heterophilic(str(tmp_path), "film", split=3)
    assert d["x"].shape == (2, 932)
    assert d["x"][0, [0, 5, 931]].tolist() == [1.0, 1.0, 1.0]
    assert d["x"].sum() == 4.0
    np.testing.assert_array_equal(d["y"], [1, 3])
