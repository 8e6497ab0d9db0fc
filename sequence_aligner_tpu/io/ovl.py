"""AMOS {OVL} message writing, parsing and golden comparison.

Output format replicates the reference writer exactly: each record is the
6-line block from ``src/ObjectStore.scala:127-135`` followed by a newline
(``src/Project4.scala:814-819``).  The reference's emission order is Trove
hash-map iteration order; we emit in canonical (id_a, id_b) sorted order —
the order the golden ``amos/small/crp177.ovl`` fixture is in — and compare
golden files as canonically-sorted record lists.
"""

from __future__ import annotations

import sys
from collections.abc import Iterable, Sequence as Seq

from sequence_aligner_tpu.core.records import OverlapRecord


def canonical_sort(records: Iterable[OverlapRecord]) -> list[OverlapRecord]:
    return sorted(records, key=OverlapRecord.sort_key)


def write_ovl(records: Iterable[OverlapRecord], path: str | None = None) -> int:
    """Write records; path=None writes to stdout like the reference's
    no-output mode (src/Project4.scala:815-819). Returns record count.

    File output takes the native (C++) formatter when available and every
    record has the default adj/scr fields (always true for engine output).
    """
    if path is None:
        n = 0
        for r in records:
            print(r.render())
            n += 1
        return n
    recs = records if isinstance(records, list) else list(records)
    if all(r.adj == "N" and r.scr == 0 for r in recs):
        from sequence_aligner_tpu.native import ovl_write_native

        wrote = ovl_write_native(
            path,
            [r.id_a for r in recs], [r.id_b for r in recs],
            [r.ahg for r in recs], [r.bhg for r in recs],
        ) if recs else None
        if wrote is not None:
            return len(recs)
    with open(path, "w") as f:
        for r in recs:
            f.write(r.render() + "\n")
    return len(recs)


def write_ovl_arrays(arrs, path: str | None = None) -> int:
    """Array-native {OVL} emission: (lead, trail, ahg, bhg) int sequences
    -> file (native C++ formatter when available) or stdout.  The
    production path — no per-record Python objects are ever built.
    Returns the record count."""
    lead, trail, ahg, bhg = arrs
    n = len(lead)
    if path is not None and n:
        from sequence_aligner_tpu.native import ovl_write_native

        if ovl_write_native(path, lead, trail, ahg, bhg) is not None:
            return n
    # chunked fallback: at 1M records one f-string per record plus the
    # fully-joined text is hundreds of MB of transient host memory —
    # stream fixed-size batches instead
    out = sys.stdout if path is None else open(path, "w")
    try:
        chunk = 1 << 16
        for lo in range(0, n, chunk):
            out.writelines(
                f"{{OVL\nadj:N\nrds:{a},{b}\nscr:0\nahg:{h}\nbhg:{g}\n}}\n"
                for a, b, h, g in zip(
                    lead[lo : lo + chunk], trail[lo : lo + chunk],
                    ahg[lo : lo + chunk], bhg[lo : lo + chunk],
                )
            )
    finally:
        if path is not None:
            out.close()
    return n


def parse_ovl(path_or_text: str, *, is_text: bool = False) -> list[OverlapRecord]:
    """Parse an AMOS OVL message file into records."""
    text = path_or_text if is_text else open(path_or_text).read()
    records: list[OverlapRecord] = []
    cur: dict[str, str] = {}
    in_rec = False
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{OVL"):
            in_rec = True
            cur = {}
        elif line == "}":
            if in_rec:
                a, b = cur["rds"].split(",")
                records.append(
                    OverlapRecord(
                        id_a=int(a),
                        id_b=int(b),
                        ahg=int(cur["ahg"]),
                        bhg=int(cur["bhg"]),
                        adj=cur.get("adj", "N"),
                        scr=int(cur.get("scr", "0")),
                    )
                )
            in_rec = False
        elif in_rec and ":" in line:
            k, v = line.split(":", 1)
            cur[k] = v
    return records


def records_equal(
    got: Seq[OverlapRecord], want: Seq[OverlapRecord], *, verbose: bool = False
) -> bool:
    """Canonical-set equality of two OVL record lists."""
    g = canonical_sort(got)
    w = canonical_sort(want)
    if g == w:
        return True
    if verbose:
        gs, ws = set(g), set(w)
        missing = sorted(ws - gs, key=OverlapRecord.sort_key)
        extra = sorted(gs - ws, key=OverlapRecord.sort_key)
        print(f"records_equal: got {len(g)} want {len(w)}", file=sys.stderr)
        for r in missing[:20]:
            print(f"  missing: {r}", file=sys.stderr)
        for r in extra[:20]:
            print(f"  extra:   {r}", file=sys.stderr)
    return False
