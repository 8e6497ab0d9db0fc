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
from sequence_aligner_tpu.ops.align_lax import fast_dovetail_batch, local_align_batch
from sequence_aligner_tpu.ops.encode import encode_reads
from sequence_aligner_tpu.ops.kmer import kmer_scan
from sequence_aligner_tpu.ops.pairgen import candidate_pairs_device
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
    ):
        self.s = settings
        self.fast_dovetail = fast_dovetail
        self.batch_size = batch_size
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
        plan = plan_pair_capacities(bases, lengths, s)
        cap_h = _pow2_at_least(plan["h_total"])
        cap_t = _pow2_at_least(plan["t_total"])
        raw = plan["h_total"] + plan["t_total"]
        cap_out = _pow2_at_least(raw // max(s.min_collisions, 1) + 1024)
        while True:
            out = candidate_pairs_device(
                occ, **geom,
                min_collisions=jnp.int32(s.min_collisions),
                max_collisions=jnp.int32(s.max_collisions),
                cap_head=cap_h, cap_tail=cap_t, cap_out=cap_out,
            )
            if not bool(out["overflow"]):
                break
            cap_h = _pow2_at_least(int(out["head_total"]), cap_h * 2)
            cap_t = _pow2_at_least(int(out["tail_total"]), cap_t * 2)
            cap_out = cap_out * 2
        n = int(out["n_out"])
        lead = np.asarray(out["lead"][:n])
        trail = np.asarray(out["trail"][:n])
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
        for w in np.unique(widths):
            idxs = np.nonzero(widths == w)[0]
            bs = min(self.batch_size, _pow2_at_least(len(idxs), 256))
            for lo in range(0, len(idxs), bs):
                chunk = idxs[lo : lo + bs]
                pad = bs - len(chunk)
                ci = np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
                a_idx = lead[ci] - 1
                b_idx = trail[ci] - 1
                kw = dict(
                    cm=cm, gO=s.gap_open, gE=s.gap_extend,
                    min_identity=jnp.float32(s.min_identity),
                    min_overlap=jnp.int32(s.min_overlap),
                    max_ignore=jnp.int32(s.max_ignore),
                    la_max=bases.shape[1], lb_max=bases.shape[1],
                )
                if self.fast_dovetail:
                    res = fast_dovetail_batch(
                        jnp.asarray(bases[a_idx]), jnp.asarray(lengths[a_idx]),
                        jnp.asarray(bases[b_idx]), jnp.asarray(lengths[b_idx]),
                        width=w, **kw,
                    )
                else:
                    res = local_align_batch(
                        jnp.asarray(bases[a_idx]), jnp.asarray(lengths[a_idx]),
                        jnp.asarray(bases[b_idx]), jnp.asarray(lengths[b_idx]),
                        **kw,
                    )
                for k in out:
                    vals = np.asarray(res[k])
                    out[k][chunk] = vals[: len(chunk)]
        return out

    # ---- full pipeline ----
    def run(self, path_or_seqs: str | list[Sequence]) -> list[OverlapRecord]:
        seqs = (
            read_fasta(path_or_seqs)
            if isinstance(path_or_seqs, str)
            else path_or_seqs
        )
        bases, lengths = encode_reads(seqs)
        self.stats.n_reads = len(seqs)
        # pad the read count to a power-of-two tier so device programs
        # compile once per (N_tier, L) shape family
        n_tier = _pow2_at_least(len(seqs), 256)
        if n_tier > len(seqs):
            bases = np.pad(bases, ((0, n_tier - len(seqs)), (0, 0)))
            lengths = np.pad(lengths, (0, n_tier - len(seqs)))
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
