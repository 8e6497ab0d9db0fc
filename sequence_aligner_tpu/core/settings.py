"""Alignment configuration.

Replicates the semantics of the reference's immutable settings blob
(``src/ObjectStore.scala:17-36``) with the CLI defaults installed by its
argument parser (``src/Project4.scala:41,101-114``), as a frozen dataclass.

The substitution score is carried as a 4x4 int32 matrix indexed by the 2-bit
base codes (A=0, C=1, T=2, G=3 — the ``seqHash`` packing order of
``src/ObjectStore.scala:56-59``) so that device code never touches strings.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

# 2-bit base encoding, matching the reference k-mer hash packing
# (src/ObjectStore.scala:56-59): A=00, C=01, T=10, G=11.
BASE_CODE = {"A": 0, "C": 1, "T": 2, "G": 3}
CODE_BASE = "ACTG"

# HOXD70 substitution scores, hard-coded like the reference's default matrix
# (src/BioLibs.scala:119-161).  The reference stores it in A,C,G,T index
# order; values below are laid out in our A,C,T,G base-code order.
_HOXD70 = {
    ("A", "A"): 91, ("A", "C"): -114, ("A", "G"): -31, ("A", "T"): -123,
    ("C", "A"): -114, ("C", "C"): 100, ("C", "G"): -125, ("C", "T"): -31,
    ("G", "A"): -31, ("G", "C"): -125, ("G", "G"): 100, ("G", "T"): -114,
    ("T", "A"): -123, ("T", "C"): -31, ("T", "G"): -114, ("T", "T"): 91,
}


def default_hoxd_matrix() -> np.ndarray:
    """4x4 int32 HOXD70 matrix in base-code (A,C,T,G) order."""
    m = np.zeros((4, 4), dtype=np.int32)
    for (a, b), v in _HOXD70.items():
        m[BASE_CODE[a], BASE_CODE[b]] = v
    return m


def simple_match_matrix(match: int, mismatch: int) -> np.ndarray:
    """Flat match/mismatch cost matrix (src/BioLibs.scala:165-167)."""
    m = np.full((4, 4), int(mismatch), dtype=np.int32)
    np.fill_diagonal(m, int(match))
    return m


@dataclasses.dataclass(frozen=True)
class AlignSettings:
    """Immutable alignment settings.

    Field semantics and defaults follow the reference CLI
    (``src/Project4.scala:104-114`` and ``src/ObjectStore.scala:17-36``).
    """

    # 4x4 int32 substitution matrix in base-code order (A,C,T,G).
    cost_matrix: np.ndarray = dataclasses.field(default_factory=default_hoxd_matrix)
    gap_open: int = -200
    gap_extend: int = -20
    min_overlap: int = 40
    min_identity: float = 0.98
    max_ignore: int = 90
    kmer_size: int = 12
    min_collisions: int = 7
    max_collisions: int = 222
    kmer_edge: float = 0.4
    kmer_center: float = 0.4

    def __post_init__(self):
        # normalize to float32 so threshold comparisons match the
        # reference's Float arithmetic exactly
        object.__setattr__(self, "min_identity", np.float32(self.min_identity))
        object.__setattr__(self, "kmer_edge", np.float32(self.kmer_edge))
        object.__setattr__(self, "kmer_center", np.float32(self.kmer_center))
        cm = np.asarray(self.cost_matrix, dtype=np.int32)
        if cm.shape != (4, 4):
            raise ValueError("cost_matrix must be 4x4")
        object.__setattr__(self, "cost_matrix", cm)

    # Derived positional-class geometry (src/ObjectStore.scala:32-35).
    @property
    def kmer_head_edge(self) -> np.float32:
        return np.float32(self.kmer_edge)

    @property
    def kmer_tail_edge(self) -> np.float32:
        return np.float32(np.float32(1.0) - np.float32(self.kmer_edge))

    @property
    def kmer_mid_lead_edge(self) -> np.float32:
        return np.float32(np.float32(0.5) - np.float32(self.kmer_center) * np.float32(0.5))

    @property
    def kmer_mid_tail_edge(self) -> np.float32:
        return np.float32(np.float32(0.5) + np.float32(self.kmer_center) * np.float32(0.5))

    def band_width(self, len_a: int) -> int:
        """Dovetail DP band width (src/BioLibs.scala:389-390):
        max(kmer_size, floor(|A| * (1 - min_identity)) + 1).

        The product is evaluated in float32 to match the reference's
        ``Int * Float`` arithmetic (0.96f-style rounding differences matter).
        """
        frac = np.float32(np.float32(1.0) - np.float32(self.min_identity))
        return max(
            self.kmer_size,
            int(math.floor(float(np.float32(len_a) * frac))) + 1,
        )

    def band_widths(self, len_a: np.ndarray) -> np.ndarray:
        """Vectorized band_width over an int array of lead lengths."""
        frac = np.float32(np.float32(1.0) - np.float32(self.min_identity))
        w = np.floor(
            (len_a.astype(np.float32) * frac).astype(np.float64)
        ).astype(np.int32) + 1
        return np.maximum(w, np.int32(self.kmer_size))

    def score(self, a: str, b: str) -> int:
        """Char-level cost lookup (oracle path)."""
        return int(self.cost_matrix[BASE_CODE[a.upper()], BASE_CODE[b.upper()]])

    def replace(self, **kw) -> "AlignSettings":
        return dataclasses.replace(self, **kw)

    @classmethod
    def amos_parity(cls, **kw) -> "AlignSettings":
        """Profile that reproduces AMOS ``hash-overlap -B -x 0.04 -o 40``
        output byte-for-byte on the bundled golden data.

        The reference program's default collision band [7, 222] drops true
        minimum-length (40 bp) overlaps whose edge x middle collision count
        is ~4-5 (its README admits the tuning is imperfect); widening the
        band floor to 2 recovers exactly the AMOS golden record set
        (verified byte-identical on amos/small/crp177.{seq,ovl}).
        """
        kw.setdefault("min_collisions", 2)
        return cls(**kw)
