"""The end-to-end overlap engine (flagship model).

Drives the device ops through the reference's production call stack
(src/Project4.scala:56-59: k-mer table -> candidate dispatch -> block
alignment -> OVL emission), re-expressed as four jitted stages with
host-side capacity management between them:

  encode (host)  ->  kmer_scan (jit)  ->  candidate_pairs_device (jit,
  capacity-doubling on overflow)  ->  fast_dovetail_batch /
  local_align_batch (jit, bucketed by (band width, length class),
  fixed-size pair batches)  ->  host gather + canonical sort + OVL.

The reference's "block" strategy (lead read + trailing set sharing DP
buffers, src/KmerTable.scala:246-273) maps here to batching: thousands of
pairs per kernel launch with uniform band geometry.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from sequence_aligner_tpu.core.records import OverlapRecord, Sequence
from sequence_aligner_tpu.core.settings import AlignSettings
from sequence_aligner_tpu.io.fasta import read_fasta
from sequence_aligner_tpu.ops.align_lax import (
    fast_dovetail_batch_idx, local_align_batch_idx,
)
from sequence_aligner_tpu.ops.encode import encode_reads
from sequence_aligner_tpu.ops.kmer import kmer_scan
from sequence_aligner_tpu.ops.pairgen import candidate_pairs_stream
from sequence_aligner_tpu.ops.plan import plan_pair_capacities


def _pow2_at_least(n: int, floor: int = 1024) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


@dataclasses.dataclass
class OverlapStats:
    n_reads: int = 0
    n_kmers: int = 0
    n_candidate_pairs: int = 0
    n_alignments: int = 0
    n_valid: int = 0


class Overlapper:
    """TPU-native overlap engine."""

    def __init__(
        self,
        settings: AlignSettings,
        *,
        fast_dovetail: bool = True,
        batch_size: int = 4096,
        use_pallas: bool | None = None,
    ):
        self.s = settings
        self.fast_dovetail = fast_dovetail
        self.batch_size = batch_size
        if use_pallas is None:
            import jax

            # Pallas fills are the fast path on real TPU; the interpret-mode
            # fallback on CPU is slower than the lax scans
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.stats = OverlapStats()

    # ---- stage 1+2: encode + kmer occurrences ----
    def _occurrences(self, bases: np.ndarray, lengths: np.ndarray):
        n = bases.shape[0]
        ids = np.arange(1, n + 1, dtype=np.int32)
        return kmer_scan(
            jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(ids),
            self.s.kmer_size,
        )

    # ---- stage 3: candidate pairs, capacities planned on host ----
    def _candidates(
        self, occ, bases: np.ndarray, lengths: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        s = self.s
        if occ["hash"].shape[0] == 0:  # e.g. every read shorter than k
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        geom = dict(
            head_edge=jnp.float32(s.kmer_head_edge),
            tail_edge=jnp.float32(s.kmer_tail_edge),
            mid_lead=jnp.float32(s.kmer_mid_lead_edge),
            mid_tail=jnp.float32(s.kmer_mid_tail_edge),
        )
        # the host plan knows the exact raw cross-product totals, so the
        # stream capacities never overflow; only cap_out (distinct pairs in
        # the collision band) is estimated and retried on overflow
        plan = plan_pair_capacities(bases, lengths, s)
        cap_head = _pow2_at_least(plan["h_total"], 1 << 14)
        cap_tail = _pow2_at_least(plan["t_total"], 1 << 14)
        cap_out = min(1 << 21, cap_head + cap_tail)
        while True:
            out = candidate_pairs_stream(
                occ, **geom,
                min_collisions=jnp.int32(s.min_collisions),
                max_collisions=jnp.int32(s.max_collisions),
                cap_head=cap_head, cap_tail=cap_tail, cap_out=cap_out,
            )
            if not bool(out["overflow"]):
                break
            cap_out *= 2
        k = int(out["n_out"])
        lead = np.asarray(out["lead"][:k])
        trail = np.asarray(out["trail"][:k])
        order = np.lexsort((trail, lead))
        return lead[order], trail[order]

    # ---- stage 4: bucketed batched alignment ----
    def _align(
        self,
        bases: np.ndarray,
        lengths: np.ndarray,
        lead: np.ndarray,
        trail: np.ndarray,
    ) -> dict[str, np.ndarray]:
        s = self.s
        npairs = len(lead)
        out = {
            k: np.zeros(npairs, dtype=np.int32)
            for k in ("start_i", "start_j", "end_i", "end_j",
                      "correct", "error", "align_len", "ahg", "bhg")
        }
        out["valid"] = np.zeros(npairs, dtype=bool)
        if npairs == 0:
            return out
        la = lengths[lead - 1]
        widths = s.band_widths(la)
        cm = jnp.asarray(s.cost_matrix)
        # reads live on device for the whole stage; per-batch traffic is
        # just the int32 pair-index vectors (row gathers are free on TPU)
        bases_d = jnp.asarray(bases)
        lengths_d = jnp.asarray(lengths)
        pending = []  # (chunk_indices, device_result) — fetched after the
        # dispatch loop so the device pipeline stays full
        for w in np.unique(widths):
            idxs = np.nonzero(widths == w)[0]
            bs = min(self.batch_size, _pow2_at_least(len(idxs), 256))
            for lo in range(0, len(idxs), bs):
                chunk = idxs[lo : lo + bs]
                pad = bs - len(chunk)
                ci = np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
                a_idx = jnp.asarray(lead[ci] - 1)
                b_idx = jnp.asarray(trail[ci] - 1)
                kw = dict(
                    cm=cm, gO=s.gap_open, gE=s.gap_extend,
                    min_identity=jnp.float32(s.min_identity),
                    min_overlap=jnp.int32(s.min_overlap),
                    max_ignore=jnp.int32(s.max_ignore),
                    la_max=bases.shape[1], lb_max=bases.shape[1],
                )
                if self.fast_dovetail and self.use_pallas:
                    from sequence_aligner_tpu.ops.align_pallas import (
                        fast_dovetail_batch_pallas_idx,
                    )

                    pkw = dict(kw)
                    pkw.pop("cm")
                    res = fast_dovetail_batch_pallas_idx(
                        bases_d, lengths_d, a_idx, b_idx,
                        width=w,
                        cm_tuple=tuple(int(x) for x in s.cost_matrix.reshape(-1)),
                        pblk=min(256, bs), **pkw,
                    )
                elif self.fast_dovetail:
                    res = fast_dovetail_batch_idx(
                        bases_d, lengths_d, a_idx, b_idx, width=w, **kw
                    )
                else:
                    res = local_align_batch_idx(
                        bases_d, lengths_d, a_idx, b_idx, **kw
                    )
                pending.append((chunk, res))
                if len(pending) >= 8:  # bound device-queue depth
                    self._fetch(out, *pending.pop(0))
        for c0, r0 in pending:
            self._fetch(out, c0, r0)
        return out

    @staticmethod
    def _fetch(out, chunk, res):
        from sequence_aligner_tpu.ops.align_lax import OUT_KEYS

        host = np.asarray(res)  # single [10, P] transfer
        for r, k in enumerate(OUT_KEYS):
            if k == "valid":
                out[k][chunk] = host[r, : len(chunk)].astype(bool)
            else:
                out[k][chunk] = host[r, : len(chunk)]

    # ---- full pipeline ----
    def run(self, path_or_seqs: str | list[Sequence]) -> list[OverlapRecord]:
        if isinstance(path_or_seqs, str):
            from sequence_aligner_tpu.native import fasta_encode_native

            enc = fasta_encode_native(path_or_seqs)  # C++ fast path
            if enc is None:
                enc = encode_reads(read_fasta(path_or_seqs))
            bases, lengths = enc
            n_input = bases.shape[0]
        else:
            bases, lengths = encode_reads(path_or_seqs)
            n_input = len(path_or_seqs)
        self.stats.n_reads = n_input
        # pad the read count to a power-of-two tier so device programs
        # compile once per (N_tier, L) shape family
        n_tier = _pow2_at_least(n_input, 256)
        if n_tier > n_input:
            bases = np.pad(bases, ((0, n_tier - n_input), (0, 0)))
            lengths = np.pad(lengths, (0, n_tier - n_input))
        occ = self._occurrences(bases, lengths)
        self.stats.n_kmers = int(np.asarray(occ["valid"]).sum())
        lead, trail = self._candidates(occ, bases, lengths)
        self.stats.n_candidate_pairs = len(lead)
        res = self._align(bases, lengths, lead, trail)
        self.stats.n_alignments = len(lead)
        valid = res["valid"]
        self.stats.n_valid = int(valid.sum())
        records = [
            OverlapRecord(
                id_a=int(lead[i]), id_b=int(trail[i]),
                ahg=int(res["ahg"][i]), bhg=int(res["bhg"][i]),
            )
            for i in np.nonzero(valid)[0]
        ]
        records.sort(key=OverlapRecord.sort_key)
        return records
