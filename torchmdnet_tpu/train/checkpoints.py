"""Checkpoint save/load.

The reference relies on Lightning checkpoints (torch.load pickles with
``state_dict`` + ``hyper_parameters``).  Here a checkpoint is a single file:
a JSON header (hyperparameters + extra metadata + blob directory) followed by
named msgpack blobs (flax.serialization) — at minimum ``params``, optionally
``opt_state`` and other training state, so both inference loading
(model.py:121-143) and full training resume (scripts/train.py:191) work from
one file.
"""

import json
import struct as _struct
from typing import Any, Dict, Optional

from flax import serialization

_MAGIC = b"TMDNTPU2"


def _json_default(obj):
    import numpy as np

    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    raise TypeError(f"Cannot serialize {type(obj)}")


def save_checkpoint(
    filepath,
    params,
    hyper_parameters: Dict[str, Any],
    extra: Optional[Dict[str, Any]] = None,
    blobs: Optional[Dict[str, Any]] = None,
):
    """blobs: extra pytrees (e.g. opt_state) serialized alongside params."""
    all_blobs = {"params": serialization.to_bytes(params)}
    for name, tree in (blobs or {}).items():
        all_blobs[name] = serialization.to_bytes(tree)
    meta = {
        "hyper_parameters": hyper_parameters,
        "extra": extra or {},
        "blob_sizes": {k: len(v) for k, v in all_blobs.items()},
    }
    meta_blob = json.dumps(meta, default=_json_default).encode("utf-8")
    with open(filepath, "wb") as f:
        f.write(_MAGIC)
        f.write(_struct.pack("<Q", len(meta_blob)))
        f.write(meta_blob)
        for blob in all_blobs.values():
            f.write(blob)


def load_checkpoint(filepath) -> Dict[str, Any]:
    """Returns {'hyper_parameters', 'extra', 'params', 'blobs': {name: bytes}}.

    ``params`` is restored generically (nested dicts of numpy arrays); other
    blobs are returned raw so callers can ``flax.serialization.from_bytes``
    them against a structural template.
    """
    with open(filepath, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{filepath} is not a torchmdnet_tpu checkpoint")
        (meta_len,) = _struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        blobs = {}
        for name, size in meta["blob_sizes"].items():
            blobs[name] = f.read(size)
    return {
        "hyper_parameters": meta["hyper_parameters"],
        "extra": meta.get("extra", {}),
        "params": serialization.msgpack_restore(blobs.pop("params")),
        "blobs": blobs,
    }


def latest_checkpoint(log_dir) -> Optional[str]:
    """Newest .ckpt in ``log_dir`` by embedded epoch (mtime breaks ties).

    The elastic-recovery hook: a restarted job with ``--auto-resume`` picks
    up exactly where the last surviving checkpoint left off, with no operator
    input.  The reference has no analog (SURVEY.md section 5: fault tolerance
    = checkpoints + manual --load-model).
    """
    import os
    import re

    best = None
    best_key = None
    try:
        names = os.listdir(log_dir)
    except FileNotFoundError:
        return None
    for name in names:
        if not name.endswith(".ckpt"):
            continue
        path = os.path.join(log_dir, name)
        m = re.search(r"epoch=(\d+)", name)
        epoch = int(m.group(1)) if m else -1
        key = (epoch, os.path.getmtime(path))
        if best_key is None or key > best_key:
            best, best_key = path, key
    return best
