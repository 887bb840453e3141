"""Host-side image pipeline with threaded prefetch.

Per-item transform pins the reference semantics (``dataset.py:51-61``,
``dataset.py:126-134``): PNG decoded as grayscale, antialiased resize to
256x256, float32 in [0,1], then (x - 0.5) / 0.5 normalisation (applied per
actual channel count — the reference's 3-channel Normalize on 1-channel
tensors is a latent crash, SURVEY §5.1 quirk 2).

TPU-first differences from the reference's torch DataLoader:
* decode/resize runs in a thread pool (the native C++ decoder in
  ``pai_tpu/native`` releases the GIL; PIL fallback otherwise) overlapped
  with device compute via a bounded prefetch queue;
* batches are laid out NHWC and placed on device with a ``NamedSharding``
  over the data-parallel mesh axis;
* the trailing partial batch (reference ``drop_last=False``) is padded to the
  fixed batch shape — cycled samples for training (keeps one compiled step
  shape), zero-padding with a validity count for eval so per-image metrics
  and outputs are exact.
"""

from __future__ import annotations

import functools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pai_tpu.data.manifest import load_manifest
from pai_tpu.utils.images import read_png_gray


class Batch(NamedTuple):
    x: jax.Array       # condition image  [B, H, W, 1]
    y: jax.Array       # ground truth     [B, H, W, 1]
    n_valid: int       # rows < n_valid are real samples


@functools.lru_cache(maxsize=None)
def _dev_normalize_fn(normalize: bool):
    """Shared jitted uint8 -> normalised float32 (one compile per process —
    remote-tunnel TPU compiles cost ~up to a minute even for this)."""

    def _norm(u8):
        f = u8.astype(jnp.float32) / 255.0
        return (f - 0.5) / 0.5 if normalize else f

    return jax.jit(_norm)


def _resize_antialias(img: np.ndarray, size: int) -> np.ndarray:
    """Antialiased resize to (size, size) — torchvision
    Resize(antialias=True) semantics (triangle filter). No-op when already
    at target size (the thesis datasets are natively 256x256)."""
    if img.shape[0] == size and img.shape[1] == size:
        return img
    try:
        from pai_tpu.native import png_native

        return png_native.resize_bilinear_antialias(img, size, size)
    except Exception:
        pass
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.BILINEAR))


def load_example_u8(paths: Tuple[str, str], image_size: int = 256
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one pair -> two [H,W,1] uint8 arrays (resize rounded to uint8,
    matching torchvision's uint8 Resize before ConvertImageDtype)."""
    out = []
    for p in paths:
        img = read_png_gray(p)
        if img.shape[0] != image_size or img.shape[1] != image_size:
            resized = _resize_antialias(img, image_size)
            img = np.clip(resized + 0.5, 0, 255).astype(np.uint8)
        out.append(img[..., None])
    return out[0], out[1]


def load_example(paths: Tuple[str, str], image_size: int = 256,
                 normalize: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one (input, ground_truth) pair -> two [H,W,1] float32 arrays."""
    x, y = load_example_u8(paths, image_size)
    out = []
    for img in (x, y):
        img = img.astype(np.float32) / 255.0
        if normalize:
            img = (img - 0.5) / 0.5
        out.append(img)
    return out[0], out[1]


class ImageDataset:
    """Paired-image dataset over a YAML manifest (dataset.py:110-134)."""

    def __init__(self, manifest_path: str, image_size: int = 256,
                 normalize: bool = True):
        self.pairs: List[Tuple[str, str]] = load_manifest(manifest_path)
        self.image_size = image_size
        self.normalize = normalize

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        return load_example(self.pairs[idx], self.image_size, self.normalize)


class BatchLoader:
    """Threaded, prefetching batch iterator with fixed batch shape.

    ``shuffle=True`` reshuffles every epoch with a per-epoch seed
    (deterministic across resumes); padding strategy per the module
    docstring. ``sharding`` (optional ``jax.sharding.NamedSharding``) places
    each batch directly in its data-parallel layout.
    """

    def __init__(
        self,
        dataset: ImageDataset,
        batch_size: int,
        shuffle: bool = False,
        pad_mode: str = "cycle",  # "cycle" (train) | "zero" (eval)
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        sharding=None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.pad_mode = pad_mode
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.sharding = sharding
        # Multi-process SPMD (SURVEY §2.5): each host decodes only its own
        # rows of the global batch and contributes them via
        # jax.make_array_from_process_local_data.
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1 and sharding is None:
            raise ValueError("multi-process loading requires a sharding")
        self.epoch = 0
        self._pool: Optional[ThreadPoolExecutor] = None
        self._dev_normalize = None

    def __len__(self) -> int:
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        return order

    def __iter__(self) -> Iterator[Batch]:
        order = self._epoch_order()
        self.epoch += 1
        n = len(order)
        bs = self.batch_size
        img = self.dataset.image_size

        batches: List[Tuple[Sequence[int], int]] = []
        for start in range(0, n, bs):
            idx = list(order[start:start + bs])
            n_valid = len(idx)
            if n_valid < bs:
                if self.pad_mode == "cycle":
                    idx = idx + list(order[: bs - n_valid])
                else:
                    idx = idx + [-1] * (bs - n_valid)
            batches.append((idx, n_valid))

        out_q: "queue.Queue[Optional[Batch]]" = queue.Queue(self.prefetch)
        # One pool per loader, reused across epochs (a 200-epoch run would
        # otherwise spin up 200 pools).
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        pool = self._pool

        try:
            from pai_tpu.native import png_native
        except Exception:
            png_native = None

        normalize = self.dataset.normalize

        if self._dev_normalize is None:
            # uint8 -> float32 conversion + normalisation runs ON DEVICE:
            # host->device ships 1 byte/px instead of 4 (the remote-tunnel
            # H2D link measured ~44 MB/s — f32 batches were the pipeline
            # bottleneck at 256² batch sizes).
            self._dev_normalize = _dev_normalize_fn(normalize)

        def assemble_u8(idx: Sequence[int]):
            xs = np.zeros((len(idx), img, img, 1), np.uint8)
            ys = np.zeros((len(idx), img, img, 1), np.uint8)
            native_done = False
            if png_native is not None:
                # Fast path: one C++ threaded decode of all 2*bs PNGs
                # (releases the GIL; overlaps with device compute).
                paths, slots = [], []
                for i, j in enumerate(idx):
                    if j >= 0:
                        pin, pgt = self.dataset.pairs[j]
                        paths += [pin, pgt]
                        slots.append(i)
                try:
                    flat, failed = png_native.decode_batch_u8(
                        paths, img, num_threads=self.num_workers)
                    for k, i in enumerate(slots):
                        if failed[2 * k] or failed[2 * k + 1]:
                            # exotic PNG -> per-item PIL fallback
                            xs[i], ys[i] = load_example_u8(
                                self.dataset.pairs[idx[i]], img)
                        else:
                            xs[i] = flat[2 * k]
                            ys[i] = flat[2 * k + 1]
                    native_done = True
                except Exception:
                    native_done = False
            if not native_done:
                futures = {
                    i: pool.submit(load_example_u8, self.dataset.pairs[j],
                                   img)
                    for i, j in enumerate(idx) if j >= 0
                }
                for i, fut in futures.items():
                    xs[i], ys[i] = fut.result()
            return xs, ys

        def assemble(idx: Sequence[int], n_valid: int) -> Batch:
            if self.process_count > 1:
                # decode only this host's rows; the global array is formed
                # from every host's local contribution
                from pai_tpu.parallel.distributed import local_batch_rows

                rows = local_batch_rows(bs, self.process_index,
                                        self.process_count)
                xs, ys = assemble_u8([idx[i] for i in rows])
                return Batch(
                    self._dev_normalize(
                        jax.make_array_from_process_local_data(
                            self.sharding, xs)),
                    self._dev_normalize(
                        jax.make_array_from_process_local_data(
                            self.sharding, ys)),
                    n_valid)
            xs, ys = assemble_u8(idx)
            if self.sharding is not None:
                return Batch(
                    self._dev_normalize(jax.device_put(xs, self.sharding)),
                    self._dev_normalize(jax.device_put(ys, self.sharding)),
                    n_valid)
            # host consumers (reporting/tests) get normalised f32 directly
            xf = xs.astype(np.float32) / 255.0
            yf = ys.astype(np.float32) / 255.0
            if normalize:
                xf = (xf - 0.5) / 0.5
                yf = (yf - 0.5) / 0.5
            return Batch(xf, yf, n_valid)

        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer has gone away, so
            an early break (max-steps) cannot leave the producer pinned on a
            full queue holding device batches."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx, n_valid in batches:
                    if not _put(assemble(idx, n_valid)):
                        return
                _put(None)
            except BaseException as exc:  # propagate to the consumer
                _put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            thread.join(timeout=5.0)
            while not out_q.empty():  # release any queued device batches
                out_q.get_nowait()
