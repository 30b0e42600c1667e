"""Checkpoint save/restore.

Replaces the reference's tf.train.Saver triplets (ref clair/model.py:712,
1010-1020) with a single compressed npz-style file of the param pytree
(+ optional optimizer state). Epoch numbering follows the reference's
``prefix-%06d`` convention so trainer resume logic
(ref clair/train.py:115-116) carries over.
"""

from __future__ import annotations

import io
import os
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import zstandard

EPOCH_DIGITS = 6  # ref shared/param.py:4 parameterOutputPlaceHolder


def checkpoint_path(prefix: str, epoch: int) -> str:
    return f"{prefix}-{epoch:0{EPOCH_DIGITS}d}"


def epoch_from_path(path: str) -> int:
    match = re.search(r"(\d{%d})$" % EPOCH_DIGITS, path)
    if not match:
        raise ValueError(f"checkpoint path {path!r} has no trailing epoch number")
    return int(match.group(1))


def save_checkpoint(path: str, params: Dict, extra: Optional[Dict[str, Any]] = None) -> None:
    host_params = jax.tree.map(np.asarray, params)
    payload = {"params": host_params, "extra": extra or {}}
    buf = io.BytesIO()
    pickle.dump(payload, buf, protocol=4)
    blob = zstandard.ZstdCompressor(level=3).compress(buf.getvalue())
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(b"CLTPUCKPT1")
        fh.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Dict, Dict[str, Any]]:
    with open(path, "rb") as fh:
        magic = fh.read(10)
        if magic != b"CLTPUCKPT1":
            raise ValueError(f"{path} is not a clair_tpu checkpoint")
        payload = pickle.loads(zstandard.ZstdDecompressor().decompress(fh.read()))
    return payload["params"], payload.get("extra", {})
