"""FASTA input.

Host-side streaming reader. Semantics follow the reference loaders
(query: src/main.cpp:82-114, reference genome: src/BWT_Index/bntseq.c:158-190):
sequence lines are concatenated verbatim (case preserved), chromosome names
are trimmed at whitespace/#/:/= and '|' becomes '-'.
"""

from __future__ import annotations

import gzip
import io
from typing import List, Tuple

import numpy as np


def trim_chromosome_name(name: str) -> str:
    """Reference src/main.cpp:35-47: '|'->'-', cut at ' ', '#', ':', '=', tab."""
    out = []
    for ch in name:
        if ch == "|":
            out.append("-")
        elif ch in (" ", "#", ":", "=", "\t"):
            break
        else:
            out.append(ch)
    return "".join(out)


def _open(path: str):
    if str(path).endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path, "r")


def read_fasta(path: str, trim_names: bool = True) -> List[Tuple[str, np.ndarray]]:
    """Read a FASTA file into [(name, ascii_uint8_array), ...].

    Sequences are returned as raw ASCII bytes (dtype uint8) with trailing
    '\r' stripped per line (reference src/main.cpp:66-69).
    """
    records: List[Tuple[str, np.ndarray]] = []
    name = None
    chunks: List[bytes] = []

    def flush():
        if name is not None:
            seq = b"".join(chunks)
            records.append((name, np.frombuffer(seq, dtype=np.uint8).copy()))

    with _open(path) as fh:
        for line in fh:
            line = line.rstrip("\r\n")
            if not line:
                continue
            if line[0] == ">":
                flush()
                raw = line[1:]
                name = trim_chromosome_name(raw) if trim_names else raw
                chunks = []
            else:
                if name is None:
                    raise ValueError(f"{path}: sequence data before first header")
                chunks.append(line.encode("ascii"))
        flush()
    if not records:
        raise ValueError(f"{path}: no FASTA records found")
    return records
