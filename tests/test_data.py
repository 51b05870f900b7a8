"""Data layer tests: folder dataset + stratified split parity, loader
padding/masking, device preprocessing, synthetic learnability."""

import numpy as np
import jax
import pytest
from PIL import Image

from vitx.data import BatchLoader, FolderDataset, SyntheticDataset
from vitx.data.pipeline import make_preprocess


@pytest.fixture(scope="module")
def folder_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("brain")
    rng = np.random.default_rng(0)
    counts = {"glioma": 10, "meningioma": 7, "none": 13, "pituitary": 5}
    for cls, n in counts.items():
        d = root / cls
        d.mkdir()
        for i in range(n):
            arr = rng.integers(0, 255, (40, 30, 3), dtype=np.uint8)
            mode = "L" if i % 3 == 0 else "RGB"   # mixed modes like real data
            img = Image.fromarray(arr if mode == "RGB" else arr[:, :, 0],
                                  mode)
            img.save(d / f"img_{i:03d}.png")
    return root


def test_folder_dataset_split_stratified(folder_root):
    train = FolderDataset(folder_root, train=True, image_size=32)
    test = FolderDataset(folder_root, train=False, image_size=32)
    total = 10 + 7 + 13 + 5
    assert len(train) + len(test) == total
    assert len(test) == round(total * 0.2) or abs(len(test) - total * 0.2) <= 1
    # stratification: each class appears in test split in ~20% proportion
    for cls_idx in range(4):
        n_total = int(np.sum(np.concatenate([train.labels, test.labels])
                             == cls_idx))
        n_test = int(np.sum(test.labels == cls_idx))
        assert 0 <= n_test <= n_total
    # deterministic split across constructions (random_state=42)
    train2 = FolderDataset(folder_root, train=True, image_size=32)
    assert [str(p) for p in train.paths] == [str(p) for p in train2.paths]


def test_folder_dataset_matches_sklearn_split(folder_root):
    """Split indices must be exactly sklearn train_test_split(random_state=42)
    — the reference's in-dataset split (BrainTumorDataset.py:24-28)."""
    from sklearn.model_selection import train_test_split

    ds_all_train = FolderDataset(folder_root, train=True)
    ds_all_test = FolderDataset(folder_root, train=False)
    labels = np.concatenate([ds_all_train.labels, ds_all_test.labels])
    n = len(labels)

    # rebuild the canonical (path, label) ordering the dataset uses
    all_paths, all_labels = [], []
    for idx, name in enumerate(ds_all_train.classes):
        for p in sorted((folder_root / name).iterdir()):
            all_paths.append(p)
            all_labels.append(idx)
    idx_tr, idx_te = train_test_split(
        np.arange(n), test_size=0.2, stratify=np.array(all_labels),
        random_state=42)
    expect_train = [str(all_paths[i]) for i in np.sort(idx_tr)]
    assert [str(p) for p in ds_all_train.paths] == expect_train


def test_folder_dataset_rgb_and_resize(folder_root):
    ds = FolderDataset(folder_root, train=True, image_size=32)
    img, label = ds.get_example(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert 0 <= label < 4


def test_loader_pads_final_batch(folder_root):
    ds = FolderDataset(folder_root, train=True, image_size=32)
    loader = BatchLoader(ds, batch_size=8)
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        assert b["image"].shape == (8, 32, 32, 3)
        assert b["mask"].shape == (8,)
    total_real = sum(int(b["mask"].sum()) for b in batches)
    assert total_real == len(ds)
    assert batches[-1]["mask"].sum() < 8 or len(ds) % 8 == 0


def test_loader_cache_decoded_serves_identical_batches():
    """cache_decoded: epoch >= 1 serves from the in-RAM example cache —
    identical content to the uncached loader, and the underlying dataset
    is not touched again after the first full pass."""

    class Counting:
        def __init__(self, inner):
            self.inner = inner
            self.calls = 0

        def __len__(self):
            return len(self.inner)

        def get_example(self, i):
            self.calls += 1
            return self.inner.get_example(i)

    base = SyntheticDataset(num_examples=40, image_size=16, num_classes=4)
    counting = Counting(base)
    cached = BatchLoader(counting, 16, shuffle=True, seed=5,
                         cache_decoded=True)
    plain = BatchLoader(base, 16, shuffle=True, seed=5)
    for epoch in (0, 1, 2):
        cached.set_epoch(epoch)
        plain.set_epoch(epoch)
        for a, b in zip(cached, plain):
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["label"], b["label"])
    # epoch 0 decoded everything (thread races may re-decode a few);
    # epochs 1-2 hit the cache only
    assert counting.calls <= 2 * len(base)
    assert counting.calls >= len(base)


def test_loader_shuffle_deterministic():
    ds = SyntheticDataset(num_examples=64, image_size=16, num_classes=4)
    l1 = BatchLoader(ds, 16, shuffle=True, seed=3)
    l2 = BatchLoader(ds, 16, shuffle=True, seed=3)
    l1.set_epoch(1)
    l2.set_epoch(1)
    b1, b2 = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(b1["label"], b2["label"])
    l2.set_epoch(2)
    b3 = next(iter(l2))
    assert not np.array_equal(b1["label"], b3["label"])


def test_preprocess_normalize_flip_resize():
    pre = make_preprocess(out_size=16, mean=(0.5, 0.5, 0.5),
                          std=(0.5, 0.5, 0.5), random_flip=True)
    u8 = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3),
                                           dtype=np.uint8)
    rng = jax.random.PRNGKey(0)
    out = pre(u8, rng, train=False)
    assert out.shape == (4, 16, 16, 3)
    assert float(out.min()) >= -1.0 - 1e-5 and float(out.max()) <= 1.0 + 1e-5
    # eval path is deterministic and unflipped
    out2 = pre(u8, jax.random.PRNGKey(9), train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # train path flips some images for some rng
    outs = [np.asarray(pre(u8, jax.random.PRNGKey(s), train=True))
            for s in range(4)]
    assert any(not np.array_equal(o, np.asarray(out)) for o in outs)


def test_synthetic_learnable_quickly():
    """A linear probe separates synthetic classes — sanity that the dataset
    carries signal (so e2e train tests are meaningful)."""
    ds = SyntheticDataset(num_examples=256, image_size=16, num_classes=4,
                          noise=0.1)
    X = np.stack([ds.get_example(i)[0].reshape(-1) for i in range(len(ds))])
    y = np.array([ds.get_example(i)[1] for i in range(len(ds))])
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=200).fit(X[:192] / 255.0, y[:192])
    acc = clf.score(X[192:] / 255.0, y[192:])
    assert acc > 0.9, acc


def test_device_prefetch_preserves_content_and_order():
    import jax
    import numpy as np
    from vitx.data.pipeline import device_prefetch

    batches = [{"image": np.full((2, 4), i, np.uint8),
                "label": np.array([i, i], np.int32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["image"], jax.Array)   # device-resident
        np.testing.assert_array_equal(np.asarray(b["image"]),
                                      batches[i]["image"])
        np.testing.assert_array_equal(np.asarray(b["label"]),
                                      batches[i]["label"])


def test_device_prefetch_with_mesh_sharding():
    import jax
    import numpy as np
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vitx.data.pipeline import device_prefetch
    from vitx.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(dp=8, tp=1)
    sh = NamedSharding(mesh, P("data"))
    batches = [{"image": np.ones((16, 4), np.float32) * i} for i in range(3)]
    out = list(device_prefetch(iter(batches), size=2, sharding=sh))
    assert out[0]["image"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out[2]["image"]),
                                  batches[2]["image"])


def test_random_resized_crop_and_jitter():
    """Train-time RRC/jitter: static output shape, per-sample variation,
    deterministic in rng; eval path ignores them entirely."""
    import jax

    pre = make_preprocess(out_size=16, mean=None, random_flip=False,
                          random_crop=True, color_jitter=0.4)
    imgs = np.random.default_rng(0).integers(
        0, 255, (4, 32, 32, 3), np.uint8)
    rng = jax.random.PRNGKey(0)

    out = np.asarray(pre(imgs, rng, train=True))
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0
    # deterministic in rng; different rng -> different crops
    out2 = np.asarray(pre(imgs, rng, train=True))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(pre(imgs, jax.random.PRNGKey(1), train=True))
    assert not np.array_equal(out, out3)
    # per-sample variation: identical inputs get different crops
    same = np.repeat(imgs[:1], 4, axis=0)
    outs = np.asarray(pre(same, rng, train=True))
    assert not np.array_equal(outs[0], outs[1])

    # eval path = plain resize, identical to an augmentation-free pipeline
    plain = make_preprocess(out_size=16, mean=None, random_flip=False)
    np.testing.assert_allclose(np.asarray(pre(imgs, rng, train=False)),
                               np.asarray(plain(imgs, rng, train=False)),
                               rtol=1e-6)


def test_full_scale_crop_approximates_resize():
    """With crop area pinned to the full image and square aspect, RRC
    reduces to the plain bilinear resize (up to resampler boundary
    handling)."""
    import jax

    pre = make_preprocess(out_size=16, mean=None, random_flip=False,
                          random_crop=True, crop_scale=(1.0, 1.0))
    imgs = np.random.default_rng(1).integers(
        0, 255, (2, 32, 32, 3), np.uint8)
    out = np.asarray(pre(imgs, jax.random.PRNGKey(0), train=True))
    plain = make_preprocess(out_size=16, mean=None, random_flip=False)
    ref = np.asarray(plain(imgs, jax.random.PRNGKey(0), train=False))
    # aspect still samples in [3/4, 4/3]; only compare the scale of values
    assert out.shape == ref.shape
    assert abs(out.mean() - ref.mean()) < 0.05


def test_randaugment_ops_unit():
    """Building blocks: identity warp is exact; invert/solarize/posterize
    color ops match their closed forms; ops select per sample."""
    import jax
    import jax.numpy as jnp

    from vitx.data.randaugment import _color_ops, _warp

    img = jnp.asarray(np.random.default_rng(0).random((12, 10, 3)),
                      jnp.float32)
    ident = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(_warp(img, ident)),
                               np.asarray(img), atol=1e-6)
    # translate by +2 px in x: output col c reads input col c+2
    trans = jnp.array([[1.0, 0.0, 2.0], [0.0, 1.0, 0.0]])
    w = np.asarray(_warp(img, trans))
    np.testing.assert_allclose(w[:, :-2], np.asarray(img)[:, 2:], atol=1e-5)

    # translate ops are per-axis (timm translate-x / translate-y), never
    # diagonal: translate_x (op 4) moves columns only, translate_y (op 5)
    # rows only
    from vitx.data.randaugment import _OPS, _affine_params

    m4 = np.asarray(_affine_params(jnp.asarray(_OPS.index("translate_x")),
                                   jnp.asarray(1.0), 8, 8))
    assert m4[0, 2] != 0.0 and m4[1, 2] == 0.0
    m5 = np.asarray(_affine_params(jnp.asarray(_OPS.index("translate_y")),
                                   jnp.asarray(1.0), 8, 8))
    assert m5[0, 2] == 0.0 and m5[1, 2] != 0.0

    x = jnp.asarray(np.random.default_rng(1).random((4, 8, 8, 3)),
                    jnp.float32)
    # per-sample op selection: sample 0 invert, others identity (0)
    inv, sol, post = (_OPS.index("invert"), _OPS.index("solarize"),
                      _OPS.index("posterize"))
    ops = jnp.array([inv, 0, 0, 0])
    mag = jnp.array([1.0, 1.0, 1.0, 1.0])
    out = np.asarray(_color_ops(x, ops, mag))
    np.testing.assert_allclose(out[0], 1.0 - np.asarray(x)[0], atol=1e-6)
    np.testing.assert_allclose(out[1:], np.asarray(x)[1:], atol=1e-6)
    # solarize at |mag|=0.5: values >= 0.5 inverted
    out = np.asarray(_color_ops(x, jnp.full((4,), sol), 0.5 * mag))
    xs = np.asarray(x)
    np.testing.assert_allclose(out, np.where(xs >= 0.5, 1.0 - xs, xs),
                               atol=1e-6)
    # posterize at |mag|=1 keeps 4 bits -> at most 16 distinct levels
    out = np.asarray(_color_ops(x, jnp.full((4,), post), 1.0 * mag))
    assert np.unique(np.round(out * 15.0)).size <= 16
    np.testing.assert_allclose(out, np.round(xs * 15.0) / 15.0, atol=1e-6)


def test_randaugment_batch_and_pipeline():
    """rand_augment: shape/range preserved, rng-deterministic, per-sample
    variation; preprocess integration leaves the eval path untouched."""
    import jax

    from vitx.data.randaugment import rand_augment, random_erasing

    x = np.random.default_rng(2).random((6, 16, 16, 3)).astype(np.float32)
    out = np.asarray(rand_augment(jax.numpy.asarray(x),
                                  jax.random.PRNGKey(0)))
    assert out.shape == x.shape and np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    out2 = np.asarray(rand_augment(jax.numpy.asarray(x),
                                   jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(out, out2)
    # identical rows augmented differently (per-sample op draw)
    same = np.repeat(x[:1], 6, axis=0)
    outs = np.asarray(rand_augment(jax.numpy.asarray(same),
                                   jax.random.PRNGKey(3)))
    assert any(not np.array_equal(outs[0], outs[i]) for i in range(1, 6))

    # random erasing: prob=0 is identity; prob=1 erases a rectangle per row
    xe = jax.numpy.asarray(x)
    np.testing.assert_array_equal(
        np.asarray(random_erasing(xe, jax.random.PRNGKey(0), prob=0.0)), x)
    er = np.asarray(random_erasing(xe, jax.random.PRNGKey(1), prob=1.0))
    changed = (er != x).any(axis=-1)            # (B, H, W)
    assert changed.any(axis=(1, 2)).all()       # every row has an erase box
    assert (~changed).any(axis=(1, 2)).all()    # ...but never the full image

    # pipeline integration: train path applies, eval path is unchanged
    pre = make_preprocess(out_size=16, mean=None, random_flip=False,
                          randaug_layers=2, random_erase=0.5)
    u8 = np.random.default_rng(3).integers(0, 255, (4, 16, 16, 3), np.uint8)
    t = np.asarray(pre(u8, jax.random.PRNGKey(0), train=True))
    assert t.shape == (4, 16, 16, 3) and np.isfinite(t).all()
    plain = make_preprocess(out_size=16, mean=None, random_flip=False)
    np.testing.assert_allclose(
        np.asarray(pre(u8, jax.random.PRNGKey(0), train=False)),
        np.asarray(plain(u8, jax.random.PRNGKey(0), train=False)), rtol=1e-6)


def test_folder_predefined_split_dirs(tmp_path):
    """folder: datasets with predefined Training/Testing (or train/val)
    split dirs use them verbatim — no internal stratified split — and the
    class lists must agree across splits."""
    import pytest
    from PIL import Image

    from vitx.cli.train import make_datasets
    from vitx.core.config import ViTConfig

    rng = np.random.default_rng(0)
    counts = {"Training": {"glioma": 6, "none": 5},
              "Testing": {"glioma": 3, "none": 2}}
    for split, classes in counts.items():
        for cls, n in classes.items():
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(rng.integers(0, 255, (20, 20, 3),
                                             dtype=np.uint8)).save(
                    d / f"{i}.png")

    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=2,
                    embed_dim=32, depth=1, num_heads=2,
                    compute_dtype="float32")
    train_ds, eval_ds = make_datasets(f"folder:{tmp_path}", cfg, seed=0)
    assert len(train_ds) == 11 and len(eval_ds) == 5
    assert train_ds.classes == eval_ds.classes == ["glioma", "none"]

    # class mismatch across splits is an error, not silent label skew
    (tmp_path / "Testing" / "pituitary").mkdir()
    Image.fromarray(rng.integers(0, 255, (20, 20, 3),
                                 dtype=np.uint8)).save(
        tmp_path / "Testing" / "pituitary" / "0.png")
    with pytest.raises(ValueError, match="disagree"):
        make_datasets(f"folder:{tmp_path}", cfg, seed=0)


def test_warp_mxu_matches_gather():
    """The gather-free MXU warp (Catmull-Smith two-pass tent-matmul,
    randaugment.py::_warp_mxu) matches the direct 2-D gather warp up to
    interpolation-model differences: EXACT for identity and integer
    translates, close elsewhere away from the 1-px soft boundary."""
    import jax
    import jax.numpy as jnp

    from vitx.data.randaugment import _affine_params, _warp, _warp_mxu

    img = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)),
                      jnp.float32)
    ident = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    np.testing.assert_allclose(np.asarray(_warp_mxu(img, ident))[0],
                               np.asarray(img)[0], atol=1e-5)
    trans = jnp.array([[[1.0, 0.0, 2.0], [0.0, 1.0, 0.0]]])
    w = np.asarray(_warp_mxu(img, trans))[0]
    np.testing.assert_allclose(w[:, :-2], np.asarray(img)[0][:, 2:],
                               atol=1e-5)

    # every geometric op at moderate magnitude: interior agreement with
    # the gather warp (boundary band differs by design: soft fill edge)
    for op in range(6):
        m = _affine_params(jnp.asarray(op), jnp.asarray(0.35), 16, 16)
        ref = np.asarray(_warp(img[0], m))
        got = np.asarray(_warp_mxu(img, m[None]))[0]
        inner = np.s_[4:-4, 4:-4]
        assert np.abs(ref[inner] - got[inner]).mean() < 0.02, op
