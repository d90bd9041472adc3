"""Raw codec: bit-packed code files for storage interop.

Replaces the reference's faiss-based packing
(reference: qinco_v1/codec_qinco.py:135-150 — ``faiss.pack_bitstrings``):
codes (N, M) with K codewords per step pack into ceil(M·nbits/8) bytes
per vector, little-endian bit order, written after a small header.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

MAGIC = b"QCOD"


def pack_codes(codes: np.ndarray, nbits: int) -> np.ndarray:
    """codes (N, M) ints < 2^nbits -> packed (N, ceil(M*nbits/8)) uint8."""
    codes = np.asarray(codes, np.uint64)
    n, m = codes.shape
    assert nbits <= 32
    total_bits = m * nbits
    nbytes = (total_bits + 7) // 8
    shifts = np.arange(nbits, dtype=np.uint64)[None, None, :]
    bits = ((codes[:, :, None] >> shifts) & np.uint64(1)).reshape(
        n, -1
    )  # (n, m*nbits), bit order: code 0 LSB first
    padded = np.zeros((n, nbytes * 8), np.uint8)
    padded[:, :total_bits] = bits
    return (
        (padded.reshape(n, nbytes, 8) << np.arange(8)[None, None, :])
        .sum(-1)
        .astype(np.uint8)
    )


def unpack_codes(packed: np.ndarray, m: int, nbits: int) -> np.ndarray:
    packed = np.asarray(packed, np.uint8)
    n = packed.shape[0]
    bitpos = np.arange(m * nbits)
    bits = (packed[:, bitpos // 8] >> (bitpos % 8)) & 1  # (n, m*nbits)
    bits = bits.reshape(n, m, nbits).astype(np.uint64)
    shifts = np.arange(nbits, dtype=np.uint64)[None, None, :]
    return (bits << shifts).sum(-1).astype(np.int32)


def write_codes_file(path: str | Path, codes: np.ndarray, K: int) -> None:
    """codes (M, N) or (N, M); stored row-per-vector with a header."""
    codes = np.asarray(codes)
    if codes.shape[0] < codes.shape[1]:  # (M, N) layout from encode
        codes = codes.T
    n, m = codes.shape
    nbits = max(1, int(np.ceil(np.log2(K))))
    packed = pack_codes(codes, nbits)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<IIII", n, m, K, nbits))
        packed.tofile(f)


def read_codes_file(path: str | Path) -> tuple[np.ndarray, int]:
    """-> (codes (N, M) int32, K)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        assert magic == MAGIC, f"not a qinco-tpu codes file: {path}"
        n, m, K, nbits = struct.unpack("<IIII", f.read(16))
        nbytes = (m * nbits + 7) // 8
        packed = np.fromfile(f, dtype=np.uint8).reshape(n, nbytes)
    return unpack_codes(packed, m, nbits), K
