"""Simulation provenance: results directory + input copies.

Reference behavior (src/pihna.C:104-129 and every driver's input()):
results directory named from the deck's `directory` key (default: a
%Y%m%d_%H%M%S timestamp), the deck and the IC files copied into it.
The solid/coupled drivers additionally `rm -rf` an existing directory first
(src/solid.C:124-135).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Iterable, Optional


def timestamp_dirname() -> str:
    return time.strftime("%Y%m%d_%H%M%S")


def prepare_results_dir(
    directory: Optional[str],
    deck_path: Optional[str] = None,
    copies: Iterable[str] = (),
    wipe: bool = False,
) -> str:
    d = directory or timestamp_dirname()
    if wipe and os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    for src in ([deck_path] if deck_path else []) + list(copies):
        if src and os.path.isfile(src):
            shutil.copy(src, os.path.join(d, os.path.basename(src)))
    return d
