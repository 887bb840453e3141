"""YAML data-manifest parsing (reference ``dataset.py:22-46``).

A manifest is a YAML list of ``{input: <path>, ground_truth: <path>}``
entries; paths are resolved relative to the manifest file's directory.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import yaml


def load_manifest(path: str) -> List[Tuple[str, str]]:
    with open(path, "r") as f:
        entries = yaml.safe_load(f)
    base = os.path.dirname(str(path))
    return [
        (os.path.join(base, e["input"]), os.path.join(base, e["ground_truth"]))
        for e in entries
    ]
