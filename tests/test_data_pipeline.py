"""Data pipeline tests: manifest resolution, normalisation round trip,
batching/padding, shuffling determinism, native codec parity (SURVEY §4)."""

import os

import numpy as np
import pytest

from pai_tpu.data import ImageDataset, BatchLoader, load_manifest
from pai_tpu.utils.images import write_png, denormalize, to_int_np


@pytest.fixture()
def manifest(tmp_path):
    sub = tmp_path / "imgs"
    sub.mkdir()
    rng = np.random.default_rng(1)
    entries = []
    for i in range(7):
        x = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        write_png(x, str(sub / f"in_{i}.png"))
        write_png(255 - x, str(sub / f"gt_{i}.png"))
        entries.append(
            f"- input: imgs/in_{i}.png\n  ground_truth: imgs/gt_{i}.png\n")
    m = tmp_path / "data.yaml"
    m.write_text("".join(entries))
    return str(m)


def test_manifest_relative_paths(manifest):
    pairs = load_manifest(manifest)
    assert len(pairs) == 7
    # paths resolved relative to the manifest dir (dataset.py:22-46)
    assert all(os.path.isabs(p) or os.path.exists(p)
               for pair in pairs for p in pair)
    assert all(os.path.exists(p) for pair in pairs for p in pair)


def test_normalize_denormalize_roundtrip(manifest):
    ds = ImageDataset(manifest, image_size=32)
    x, y = ds[0]
    assert x.shape == (32, 32, 1) and x.dtype == np.float32
    assert -1.0 <= x.min() and x.max() <= 1.0
    # denormalize(to [0,1]) then back to uint8 must equal the source pixels
    back = to_int_np(np.asarray(denormalize(x)))[..., 0]
    from pai_tpu.utils.images import read_png_gray

    src = read_png_gray(ds.pairs[0][0])
    assert np.array_equal(back, src)


def test_batching_and_zero_padding(manifest):
    ds = ImageDataset(manifest, image_size=32)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, pad_mode="zero")
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].n_valid == 4
    assert batches[1].n_valid == 3
    assert batches[1].x.shape == (4, 32, 32, 1)  # fixed shape
    # padded rows are zero-pixel images -> normalised constant -1.0; they
    # are masked everywhere via n_valid
    pad_row = np.asarray(batches[1].x[3])
    assert float(pad_row.min()) == float(pad_row.max()) == -1.0


def test_cycle_padding(manifest):
    ds = ImageDataset(manifest, image_size=32)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, pad_mode="cycle")
    batches = list(loader)
    # padded row cycles from the epoch order start
    np.testing.assert_array_equal(
        np.asarray(batches[1].x[3]), np.asarray(batches[0].x[0]))


def test_shuffle_determinism(manifest):
    ds = ImageDataset(manifest, image_size=32)
    a = BatchLoader(ds, 4, shuffle=True, seed=5)
    b = BatchLoader(ds, 4, shuffle=True, seed=5)
    xa = np.concatenate([np.asarray(bt.x) for bt in a])
    xb = np.concatenate([np.asarray(bt.x) for bt in b])
    np.testing.assert_array_equal(xa, xb)
    # different epoch -> different order
    xa2 = np.concatenate([np.asarray(bt.x) for bt in a])
    assert not np.array_equal(xa, xa2)


def test_native_codec_matches_pil(tmp_path):
    pn = pytest.importorskip("pai_tpu.native.png_native")
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(40, 56), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(pn.read_png_gray(p), img)

    rgb = rng.integers(0, 255, size=(24, 24, 3), dtype=np.uint8)
    p2 = str(tmp_path / "rgb.png")
    Image.fromarray(rgb).save(p2)
    np.testing.assert_array_equal(
        pn.read_png_gray(p2),
        np.asarray(Image.open(p2).convert("L")))

    batch, failed = pn.decode_batch_u8([p, p2], 32)
    assert batch.shape == (2, 32, 32, 1)
    assert batch.dtype == np.uint8
    assert not failed.any()


def test_distributed_helpers_env_detection():
    """SURVEY §2.5: pod init is gated on launcher coordination env."""
    from pai_tpu.parallel.distributed import local_batch_rows, \
        should_initialize

    assert not should_initialize(env={})
    assert should_initialize(env={"PAI_TPU_DISTRIBUTED": "1"})
    assert should_initialize(env={"JAX_COORDINATOR_ADDRESS": "h:1234"})
    assert should_initialize(env={"COORDINATOR_ADDRESS": "h:1234"})

    assert list(local_batch_rows(8, 0, 2)) == [0, 1, 2, 3]
    assert list(local_batch_rows(8, 1, 2)) == [4, 5, 6, 7]
    assert list(local_batch_rows(8, 3, 4)) == [6, 7]
    with pytest.raises(ValueError):
        local_batch_rows(6, 0, 4)


def test_multiprocess_loader_decodes_only_local_rows(tmp_path, monkeypatch,
                                                     eight_devices):
    """process_count=2: each host decodes only its half of the global batch
    and contributes it via make_array_from_process_local_data."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pai_tpu.data import pipeline as pl

    rng = np.random.default_rng(3)
    imgs = []
    for i in range(4):
        img = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
        imgs.append(img)
        write_png(img, str(tmp_path / f"in_{i}.png"))
        write_png(255 - img, str(tmp_path / f"gt_{i}.png"))
    (tmp_path / "d.yaml").write_text("".join(
        f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n"
        for i in range(4)))

    mesh = Mesh(np.asarray(eight_devices[:2]).reshape(-1), ("dp",))
    sharding = NamedSharding(mesh, P("dp"))

    captured = []

    def fake_make_array(shard, local):
        # single-process stand-in: record the local contribution, then
        # build the "global" array by stacking the halves
        captured.append(np.asarray(local))
        full = np.concatenate([local, local], axis=0)
        return jax.device_put(full, shard)

    monkeypatch.setattr(jax, "make_array_from_process_local_data",
                        fake_make_array)

    ds = pl.ImageDataset(str(tmp_path / "d.yaml"), image_size=16)
    for pi, expect in ((0, [0, 1]), (1, [2, 3])):
        captured.clear()
        loader = pl.BatchLoader(ds, 4, shuffle=False, pad_mode="zero",
                                sharding=sharding, process_index=pi,
                                process_count=2)
        batch = next(iter(loader))
        assert batch.x.shape == (4, 16, 16, 1)
        assert captured[0].shape == (2, 16, 16, 1)
        np.testing.assert_array_equal(
            captured[0][..., 0], np.stack([imgs[j] for j in expect]))

    with pytest.raises(ValueError):
        pl.BatchLoader(ds, 4, process_count=2)  # sharding required
