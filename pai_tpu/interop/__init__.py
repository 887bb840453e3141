"""Interop with the PyTorch reference: Lightning checkpoint import."""

from pai_tpu.interop.torch_import import (
    import_lightning_state_dict,
    import_lightning_checkpoint,
    export_lightning_state_dict,
    export_lightning_checkpoint,
)
