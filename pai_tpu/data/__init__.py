"""Data pipeline: YAML manifest -> host PNG decode/resize/normalize ->
threaded prefetch -> sharded device batches."""

from pai_tpu.data.manifest import load_manifest
from pai_tpu.data.pipeline import ImageDataset, BatchLoader
from pai_tpu.data.datamodule import ImageDataModule
