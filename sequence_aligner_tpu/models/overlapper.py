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
        plan = plan_pair_capacities(bases, lengths, s)
        n_reads = bases.shape[0]
        occ_max = _pow2_at_least(plan["occ_max"], 16)
        row_tot = plan["row_tot"]  # per-read raw slot counts (host, exact)

        # partition reads into row-size tiers so heavy (repeat-rich) reads
        # get a large row_cap without inflating everyone's arrays; each
        # tier is processed in fixed-size row chunks to bound HBM (one
        # compiled program per tier, reused across chunks)
        tiers = [4096, 16384, 65536, 262144, 1 << 20]
        # rows_per_call * row_cap entries per buffer; compile time of the
        # final compaction grows superlinearly in cap_out, so chunks are
        # kept small enough that cap_out = 2^21 always suffices
        chunk_budget = 1 << 24
        all_lead: list[np.ndarray] = []
        all_trail: list[np.ndarray] = []
        lo = 0
        for tier_cap in tiers:
            sel = np.nonzero((row_tot > lo) & (row_tot <= tier_cap))[0]
            lo = tier_cap
            if len(sel) == 0:
                continue
            rows_per_call = max(64, chunk_budget // tier_cap)
            for c0 in range(0, len(sel), rows_per_call):
                chunk = sel[c0 : c0 + rows_per_call]
                n_rows = rows_per_call if len(sel) > rows_per_call else (
                    _pow2_at_least(len(chunk), 64)
                )
                group_reads = np.zeros(n_rows, dtype=np.int32)
                group_reads[: len(chunk)] = chunk + 1  # 1-based read ids
                group_lookup = np.full(n_reads + 1, -1, dtype=np.int32)
                group_lookup[chunk + 1] = np.arange(len(chunk), dtype=np.int32)
                row_cap = tier_cap
                cap_out = 1 << 21
                g_occ_max = occ_max
                while True:
                    out = candidate_pairs_device(
                        occ, jnp.asarray(group_lookup),
                        jnp.asarray(group_reads), **geom,
                        min_collisions=jnp.int32(s.min_collisions),
                        max_collisions=jnp.int32(s.max_collisions),
                        n_rows=n_rows, occ_max=g_occ_max, row_cap=row_cap,
                        cap_out=cap_out,
                    )
                    if not bool(out["overflow"]):
                        break
                    if int(out["drop_occ"]) > 0:
                        g_occ_max *= 2
                    if int(out["drop_row"]) > 0:
                        row_cap *= 2
                    if int(out["n_out"]) > cap_out:
                        cap_out *= 2
                k = int(out["n_out"])
                all_lead.append(np.asarray(out["lead"][:k]))
                all_trail.append(np.asarray(out["trail"][:k]))
        if plan["row_max"] > tiers[-1]:
            raise NotImplementedError(
                f"a read generates {plan['row_max']} raw pair slots "
                f"(> {tiers[-1]}); shard by hash prefix first"
            )
        if not all_lead:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        lead = np.concatenate(all_lead)
        trail = np.concatenate(all_trail)
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
        pending = []  # (chunk_indices, device_result) — fetched after the
        # dispatch loop so the device pipeline stays full
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
                if self.fast_dovetail and self.use_pallas:
                    from sequence_aligner_tpu.ops.align_pallas import (
                        fast_dovetail_batch_pallas,
                    )

                    pkw = dict(kw)
                    pkw.pop("cm")
                    res = fast_dovetail_batch_pallas(
                        jnp.asarray(bases[a_idx]), jnp.asarray(lengths[a_idx]),
                        jnp.asarray(bases[b_idx]), jnp.asarray(lengths[b_idx]),
                        width=w,
                        cm_tuple=tuple(int(x) for x in s.cost_matrix.reshape(-1)),
                        pblk=min(256, bs), **pkw,
                    )
                elif self.fast_dovetail:
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
                pending.append((chunk, res))
                if len(pending) >= 8:  # bound device-queue depth
                    c0, r0 = pending.pop(0)
                    for k in out:
                        out[k][c0] = np.asarray(r0[k])[: len(c0)]
        for c0, r0 in pending:
            for k in out:
                out[k][c0] = np.asarray(r0[k])[: len(c0)]
        return out

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
