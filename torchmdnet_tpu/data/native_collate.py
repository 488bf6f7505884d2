"""ctypes bridge to the native collation engine (data/native/collate.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source); falls back to the pure-numpy path in batch.py if no toolchain is
available.  The native path is used by PaddedLoader through
``fast_pad_molecules``.
"""

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_LIB = None
_TRIED = False


def _c_float_p(arr: Optional[np.ndarray]):
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_library():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    src = os.path.join(src_dir, "collate.cpp")
    so = os.path.join(src_dir, "libcollate.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.pad_collate.restype = ctypes.c_int
        _LIB = lib
    except Exception as e:  # no toolchain / compile failure -> numpy fallback
        import warnings

        warnings.warn(f"native collation unavailable ({e}); using numpy path")
        _LIB = None
    return _LIB


def fast_pad_collate(
    mols: Sequence[Dict[str, np.ndarray]],
    num_atoms: int,
    num_mol: int,
):
    """Collate via the native engine. Returns a dict of numpy arrays or None
    if the native library is unavailable / fields are incompatible."""
    lib = load_library()
    if lib is None or not mols:
        return None

    has_y = all("y" in m and m["y"] is not None for m in mols)
    has_f = all("neg_dy" in m and m["neg_dy"] is not None for m in mols)
    has_q = all("q" in m and m["q"] is not None for m in mols)
    has_s = all("s" in m and m["s"] is not None for m in mols)
    has_pq = all(("pq" in m or "partial_charges" in m) for m in mols)

    sizes = [len(m["z"]) for m in mols]
    offsets = np.zeros(len(mols) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    total = int(offsets[-1])
    if total > num_atoms or len(mols) > num_mol:
        return None

    z_concat = np.ascontiguousarray(
        np.concatenate([np.asarray(m["z"]).reshape(-1) for m in mols]), dtype=np.int64
    )
    pos_concat = np.ascontiguousarray(
        np.concatenate([np.asarray(m["pos"], dtype=np.float32) for m in mols]),
        dtype=np.float32,
    )
    y = (
        np.ascontiguousarray(
            [float(np.asarray(m["y"]).reshape(-1)[0]) for m in mols], dtype=np.float32
        )
        if has_y
        else None
    )
    neg_dy_concat = (
        np.ascontiguousarray(
            np.concatenate([np.asarray(m["neg_dy"], dtype=np.float32) for m in mols]),
            dtype=np.float32,
        )
        if has_f
        else None
    )
    q = (
        np.ascontiguousarray(
            [float(np.asarray(m["q"]).reshape(-1)[0]) for m in mols], dtype=np.float32
        )
        if has_q
        else None
    )
    s = (
        np.ascontiguousarray(
            [float(np.asarray(m["s"]).reshape(-1)[0]) for m in mols], dtype=np.float32
        )
        if has_s
        else None
    )
    pq_concat = (
        np.ascontiguousarray(
            np.concatenate(
                [
                    np.asarray(m.get("pq", m.get("partial_charges")), dtype=np.float32).reshape(-1)
                    for m in mols
                ]
            ),
            dtype=np.float32,
        )
        if has_pq
        else None
    )

    out = {
        "z": np.empty(num_atoms, dtype=np.int32),
        "pos": np.empty((num_atoms, 3), dtype=np.float32),
        "batch": np.empty(num_atoms, dtype=np.int32),
        "atom_mask": np.empty(num_atoms, dtype=np.uint8),
        "mol_mask": np.empty(num_mol, dtype=np.uint8),
    }
    y_out = np.empty((num_mol, 1), dtype=np.float32) if has_y else None
    f_out = np.empty((num_atoms, 3), dtype=np.float32) if has_f else None
    q_out = np.empty(num_mol, dtype=np.float32) if has_q else None
    s_out = np.empty(num_mol, dtype=np.float32) if has_s else None
    pq_out = np.empty(num_atoms, dtype=np.float32) if has_pq else None

    rc = lib.pad_collate(
        z_concat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _c_float_p(pos_concat),
        _c_float_p(y),
        _c_float_p(neg_dy_concat),
        _c_float_p(q),
        _c_float_p(s),
        _c_float_p(pq_concat),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(mols)),
        ctypes.c_int64(num_atoms),
        ctypes.c_int64(num_mol),
        out["z"].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _c_float_p(out["pos"]),
        out["batch"].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out["atom_mask"].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out["mol_mask"].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _c_float_p(y_out),
        _c_float_p(f_out),
        _c_float_p(q_out),
        _c_float_p(s_out),
        _c_float_p(pq_out),
    )
    if rc != 0:
        return None
    out["atom_mask"] = out["atom_mask"].astype(bool)
    out["mol_mask"] = out["mol_mask"].astype(bool)
    out["y"] = y_out
    out["neg_dy"] = f_out
    out["q"] = q_out
    out["s"] = s_out
    out["pq"] = pq_out
    return out
