"""``ImageDataModule`` — the reference's data-module facade
(``/root/reference/dataset.py:11-107``) over the TPU-native pipeline.

Constructor vocabulary matches the reference exactly:
``ImageDataModule(data_list_file, val_list_file=None, batch_size=1,
normalize=True)``; ``setup(stage)`` selects the splits with the same
stage semantics (``fit`` -> train+val, ``validate``/``test``/``predict``
-> the *data* list, dataset.py:63-75); the four ``*_dataloader()``
methods mirror dataset.py:77-107 (train shuffles, the rest do not, and
nothing is dropped — ``drop_last=False`` maps to the loaders' padded
final batch with an ``n_valid`` row count).

The loaders returned are :class:`pai_tpu.data.BatchLoader` instances,
so iteration yields fixed-shape ``Batch(x, y, n_valid)`` tuples laid out
for SPMD rather than torch (input, target) pairs — the TPU-idiomatic
equivalent of the DataLoader surface.
"""

from __future__ import annotations

from typing import Optional

from pai_tpu.data.pipeline import BatchLoader, ImageDataset


class ImageDataModule:
    def __init__(
        self,
        data_list_file: str,
        val_list_file: Optional[str] = None,
        batch_size: int = 1,
        normalize: bool = True,
        image_size: int = 256,
        seed: int = 0,
    ):
        self.data_list_file = data_list_file
        self.val_list_file = val_list_file
        self.batch_size = batch_size
        self.normalize = normalize
        self.image_size = image_size
        self.seed = seed
        self._data = ImageDataset(data_list_file, image_size,
                                  normalize=normalize)
        self._val = (ImageDataset(val_list_file, image_size,
                                  normalize=normalize)
                     if val_list_file is not None else None)
        self.train_split = None
        self.val_split = None
        self.test_split = None
        self.pred_split = None

    # -- stage selection (dataset.py:63-75) -------------------------------
    def setup(self, stage: str) -> None:
        if stage == "fit":
            self.train_split = self._data
            self.val_split = self._val
        if stage == "validate":
            self.val_split = self._data
        if stage == "test":
            self.test_split = self._data
        if stage == "predict":
            self.pred_split = self._data

    # -- loaders (dataset.py:77-107) ---------------------------------------
    def _loader(self, dataset: ImageDataset, shuffle: bool) -> BatchLoader:
        return BatchLoader(
            dataset, self.batch_size, shuffle=shuffle,
            pad_mode="cycle" if shuffle else "zero", seed=self.seed)

    def train_dataloader(self) -> BatchLoader:
        return self._loader(self.train_split, shuffle=True)

    def val_dataloader(self) -> BatchLoader:
        return self._loader(self.val_split, shuffle=False)

    def test_dataloader(self) -> BatchLoader:
        return self._loader(self.test_split, shuffle=False)

    def predict_dataloader(self) -> BatchLoader:
        return self._loader(self.pred_split, shuffle=False)
