"""Memory-mapped readers for the classic ANN vector file formats.

Replaces the reference's dependency on ``faiss.contrib.vecs_io``
(reference: qinco/datasets.py:102-120) with plain numpy memmaps — the
formats are trivial: each vector is ``[int32 dim][dim × elem]`` where
elem is uint8 (.bvecs), float32 (.fvecs) or int32 (.ivecs).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _xvecs_mmap(fname: str | Path, dtype, elem_size: int) -> np.ndarray:
    fname = Path(fname)
    size = fname.stat().st_size
    with open(fname, "rb") as f:
        dim = int(np.fromfile(f, dtype=np.int32, count=1)[0])
    assert 0 < dim < 10**6, f"implausible vector dim {dim} in {fname}"
    row_bytes = 4 + dim * elem_size
    assert size % row_bytes == 0, f"{fname}: size {size} not a multiple of {row_bytes}"
    n = size // row_bytes
    if elem_size == 4:
        mm = np.memmap(fname, dtype=np.int32, mode="r", shape=(n, dim + 1))
        return mm[:, 1:].view(dtype)
    # uint8 payload with int32 header: map as bytes and slice off the header
    mm = np.memmap(fname, dtype=np.uint8, mode="r", shape=(n, row_bytes))
    return mm[:, 4:]


def bvecs_mmap(fname: str | Path) -> np.ndarray:
    return _xvecs_mmap(fname, np.uint8, 1)


def fvecs_mmap(fname: str | Path) -> np.ndarray:
    return _xvecs_mmap(fname, np.float32, 4)


def ivecs_mmap(fname: str | Path) -> np.ndarray:
    return _xvecs_mmap(fname, np.int32, 4)


def _xvecs_write(fname: str | Path, x: np.ndarray, dtype) -> None:
    x = np.ascontiguousarray(x.astype(dtype))
    n, d = x.shape
    header = np.full((n, 1), d, dtype=np.int32)
    with open(fname, "wb") as f:
        if dtype == np.uint8:
            out = np.concatenate([header.view(np.uint8).reshape(n, 4), x], axis=1)
        else:
            out = np.concatenate([header, x.view(np.int32)], axis=1)
        out.tofile(f)


def fvecs_write(fname: str | Path, x: np.ndarray) -> None:
    _xvecs_write(fname, x, np.float32)


def ivecs_write(fname: str | Path, x: np.ndarray) -> None:
    _xvecs_write(fname, x, np.int32)


def bvecs_write(fname: str | Path, x: np.ndarray) -> None:
    _xvecs_write(fname, x, np.uint8)


def open_vectors(filepath: str | Path, dataname: str = "data") -> np.ndarray:
    """Open any supported vector file as a (possibly memmapped) 2-D array
    (reference: qinco/datasets.py:102-120)."""
    p_file = Path(filepath) if filepath else None
    if p_file is None or not p_file.is_file():
        raise FileNotFoundError(
            f"File {filepath} for data source {dataname} doesn't exist"
        )
    suffix = p_file.suffix
    if suffix == ".bvecs":
        return bvecs_mmap(p_file)
    if suffix == ".fvecs":
        return fvecs_mmap(p_file)
    if suffix == ".ivecs":
        return ivecs_mmap(p_file)
    if suffix == ".npy":
        return np.load(p_file, mmap_mode="r")
    raise ValueError(
        f"Unsupported format {suffix!r} for {dataname} at {filepath}. "
        "Supported: npy, bvecs, fvecs, ivecs."
    )
