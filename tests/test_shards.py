"""Tar-shard dataset (vitx/data/shards.py): WebDataset-convention shards,
byte-range random access, reference-parity stratified split, loader/CLI
integration."""

import tarfile
import threading

import numpy as np
import pytest

from vitx.data.shards import ShardDataset, write_shards
from vitx.data.synthetic import SyntheticDataset


def _source(n=37, size=24, classes=3, seed=0):
    return SyntheticDataset(num_examples=n, image_size=size,
                            num_classes=classes, seed=seed)


def test_write_and_roundtrip_pixels(tmp_path):
    """PNG shards reproduce the source pixels and labels exactly; shard
    sizing and the classes sidecar hold."""
    src = _source()
    paths = write_shards(src, tmp_path, shard_size=10)
    assert len(paths) == 4                       # ceil(37 / 10)
    with tarfile.open(paths[0]) as tf:
        assert len([m for m in tf if m.isfile()]) == 20   # 10 img + 10 cls

    ds = ShardDataset(tmp_path, test_size=None)
    assert len(ds) == len(src)
    assert ds.classes == list(src.classes)
    for i in (0, 13, 36):
        img, label = ds.get_example(i)
        ref_img, ref_label = src.get_example(i)
        assert label == ref_label
        np.testing.assert_array_equal(img, np.asarray(ref_img, np.uint8))


def test_raw_shards_roundtrip_and_resize(tmp_path):
    """image_format="raw" (.npy members, the host-decode-ceiling escape
    hatch): bit-exact pixel round-trip without PIL in the hot path, and the
    image_size retarget still resizes when the stored size differs."""
    src = _source(n=21, size=24)
    write_shards(src, tmp_path, shard_size=8, image_format="raw")
    with tarfile.open(sorted(tmp_path.glob("*.tar"))[0]) as tf:
        names = [m.name for m in tf if m.isfile()]
    assert any(n.endswith(".npy") for n in names)

    ds = ShardDataset(tmp_path, test_size=None)
    for i in (0, 11, 20):
        img, label = ds.get_example(i)
        ref_img, ref_label = src.get_example(i)
        assert label == ref_label
        np.testing.assert_array_equal(img, np.asarray(ref_img, np.uint8))

    ds32 = ShardDataset(tmp_path, test_size=None, image_size=32)
    img, _ = ds32.get_example(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8


def test_pack_cli_raw_to_train(tmp_path, capsys):
    """pack CLI: synthetic -> raw shards -> train --data shards:<dir>."""
    from vitx.cli.pack import main as pack_main
    from vitx.cli.train import main as train_main

    rc = pack_main(["--data", "synthetic", "--out", str(tmp_path / "d"),
                    "--format", "raw", "--image-size", "64",
                    "--shard-size", "512"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    import json

    rows = [json.loads(ln) for ln in lines]
    assert {r["split"] for r in rows} == {"train", "val"}
    assert all(r["format"] == "raw" for r in rows)
    train_main([
        "--preset", "tiny", "--data", f"shards:{tmp_path/'d'}",
        "--epochs", "1", "--batch-size", "64",
        "--compute-dtype", "float32",
    ])


def test_stratified_split_matches_folder_semantics(tmp_path):
    """train/test selection = the same sklearn stratified split the
    reference dataset (and FolderDataset) uses: disjoint, exhaustive,
    label-stratified at random_state=42."""
    from sklearn.model_selection import train_test_split

    src = _source(n=40)
    write_shards(src, tmp_path, shard_size=16)
    tr = ShardDataset(tmp_path, train=True)
    te = ShardDataset(tmp_path, train=False)
    assert len(tr) + len(te) == 40
    labels = np.asarray([src.get_example(i)[1] for i in range(40)], np.int32)
    idx_tr, idx_te = train_test_split(np.arange(40), test_size=0.2,
                                      stratify=labels, random_state=42)
    np.testing.assert_array_equal(tr.labels, labels[np.sort(idx_tr)])
    np.testing.assert_array_equal(te.labels, labels[np.sort(idx_te)])


def test_threaded_reads_are_safe(tmp_path):
    """get_example under concurrent threads (the BatchLoader decode pool)
    returns correct bytes — per-thread handle cache, no shared seek."""
    src = _source(n=24)
    write_shards(src, tmp_path, shard_size=7)
    ds = ShardDataset(tmp_path, test_size=None)
    ref = [ds.get_example(i) for i in range(len(ds))]
    errs = []

    def worker(ids):
        try:
            for i in ids:
                img, label = ds.get_example(i)
                assert label == ref[i][1]
                np.testing.assert_array_equal(img, ref[i][0])
        except Exception as e:   # surfaced below
            errs.append(e)

    order = np.random.default_rng(0).permutation(
        np.tile(np.arange(len(ds)), 4))
    threads = [threading.Thread(target=worker, args=(order[k::4],))
               for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs


def test_write_refuses_stale_shards(tmp_path):
    """Re-packing into a non-empty shard dir is refused: a smaller second
    pack would leave stale trailing shards silently mixed into the index."""
    write_shards(_source(n=12), tmp_path, shard_size=4)
    with pytest.raises(ValueError, match="already holds"):
        write_shards(_source(n=8), tmp_path, shard_size=4)


def test_unpaired_member_rejected(tmp_path):
    p = tmp_path / "shard-00000.tar"
    with tarfile.open(p, "w") as tf:
        import io

        payload = b"not really a png"
        ti = tarfile.TarInfo("0001.png")
        ti.size = len(payload)
        tf.addfile(ti, io.BytesIO(payload))   # image without .cls
    with pytest.raises(ValueError, match="unpaired"):
        ShardDataset(tmp_path, test_size=None)


def test_cli_train_eval_on_shards(tmp_path, capsys):
    """--data shards:<dir> end to end, predefined train/val shard dirs."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    write_shards(_source(n=64, size=64, classes=4, seed=0),
                 tmp_path / "d" / "train", shard_size=32)
    write_shards(_source(n=32, size=64, classes=4, seed=1),
                 tmp_path / "d" / "val", shard_size=32)
    train_main([
        "--preset", "tiny", "--data", f"shards:{tmp_path/'d'}",
        "--epochs", "1", "--batch-size", "16",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    rc = eval_main(["--preset", "tiny", "--data", f"shards:{tmp_path/'d'}",
                    "--checkpoint", str(tmp_path / "c"),
                    "--batch-size", "16"])
    assert rc == 0
