"""IQR-qualified round-over-round bench comparison (VERDICT r9 #6).

BENCH_FULL.json records per-query medians AND per-query IQRs across the
bench's repetitions. Round-over-round narratives previously chased
ambient drift (e.g. containment_pairs +2.5 s in r9 with an IQR of
0.47 s on a query nobody touched); this tool flags a query as a MOVER
only when |Δ median| exceeds its measured run-to-run spread:

    |new − old·scale| > max(iqr_new, iqr_old·scale, 0.15 s)

where scale = new_anchor / old_anchor from the fixed-cost calibration
probe both bench runs emit (VERDICT r10 #4) — the old run is expressed
in new-machine seconds first, so pure machine drift (driver headline
+15% over r8–r10 on untouched queries) is divided out instead of
argued about. Everything else is reported in one line as ambient
drift. Output is a markdown fragment pasted into SURVEY.md's bench
section.

Usage: python tools/bench_compare.py [old.json] [new.json]
  defaults: old = the last COMMITTED BENCH_FULL.json (git show
  HEAD:BENCH_FULL.json — the BENCH_r*.json driver artifacts only carry
  the truncated headline map, the full per-query medians+IQRs live in
  BENCH_FULL.json committed each round), new = the working-tree
  BENCH_FULL.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):  # driver BENCH_r*.json
        d = d["parsed"]
    return d


def _anchor(d: dict) -> float | None:
    cal = d.get("calibration_sec")
    if isinstance(cal, dict):
        return cal.get("anchor")
    return cal if isinstance(cal, (int, float)) else None


def _segment_anchor_fn(d: dict):
    """Positional anchor lookup (VERDICT r12 #3): from the interleaved
    per-segment calibration samples, return f(query_index) -> anchor sec
    = the MEDIAN across reps of the segment sample covering that suite
    position. None when the run predates interleaved sampling (falls
    back to the global anchor)."""
    import statistics

    cal = d.get("calibration_sec")
    segs = cal.get("segments") if isinstance(cal, dict) else None
    if not segs:
        return None
    by_at: dict[int, list[float]] = {}
    for s in segs:
        by_at.setdefault(int(s["at"]), []).append(float(s["sec"]))
    ats = sorted(by_at)
    med = {at: statistics.median(v) for at, v in by_at.items()}

    def f(idx: int) -> float:
        covering = [at for at in ats if at <= idx]
        return med[covering[-1] if covering else ats[0]]

    return f


def compare(old: dict, new: dict, floor: float = 0.15) -> tuple[list, list, str]:
    qo, qn = old.get("queries", {}), new.get("queries", {})
    io_, in_ = old.get("queries_iqr", {}), new.get("queries_iqr", {})
    # machine-drift normalization (VERDICT r10 #4): both runs carry a
    # fixed-cost calibration anchor → express the OLD run in NEW-machine
    # seconds (scale = new_anchor / old_anchor) before gating movers, so
    # ambient machine drift can't masquerade as a regression (or hide one)
    ao, an = _anchor(old), _anchor(new)
    scale = (an / ao) if (ao and an) else 1.0
    # per-query positional normalization (VERDICT r12 #3): when both runs
    # carry interleaved segment anchors, scale each query by the anchors
    # covering ITS suite position instead of the one global ratio — so
    # mid-suite contention in either run stops polluting the deltas
    fo, fn_ = _segment_anchor_fn(old), _segment_anchor_fn(new)
    pos_new = {name: i for i, name in enumerate(qn)}
    pos_old = {name: i for i, name in enumerate(qo)}
    movers, drift = [], []
    for name, nv in qn.items():
        if name not in qo:
            movers.append((name, None, nv, "NEW"))
            continue
        q_scale = scale
        if fo is not None and fn_ is not None:
            denom = fo(pos_old[name])
            if denom:
                q_scale = fn_(pos_new[name]) / denom
        ov = round(qo[name] * q_scale, 3)
        delta = nv - ov
        gate = max(in_.get(name, 0.0), io_.get(name, 0.0) * q_scale, floor)
        (movers if abs(delta) > gate else drift).append(
            (name, ov, nv, f"{delta:+.2f}s vs IQR-gate {gate:.2f}s")
        )
    movers.sort(key=lambda t: -(abs((t[2] or 0) - (t[1] or 0))))
    removed = [n for n in qo if n not in qn]
    seg_note = (
        " (per-query positional anchors in use)"
        if fo is not None and fn_ is not None
        else ""
    )
    norm = (
        f"; drift-normalized (anchor {ao} → {an}, scale ×{scale:.3f}"
        f"{seg_note}): "
        f"old suite ≙ {round((old.get('value') or 0) * scale, 1)}s in "
        "new-machine seconds — old columns below are pre-scaled"
        if scale != 1.0
        else "; no calibration anchor in the old run — raw comparison"
    )
    head = (
        f"suite {old.get('value')}s/{old.get('n_queries')}q → "
        f"{new.get('value')}s/{new.get('n_queries')}q "
        f"({old.get('sec_per_query')} → {new.get('sec_per_query')} s/q)"
        f"{norm}"
    )
    lines = [f"### Bench movers (IQR-qualified) — {head}", ""]
    lines.append("| query | old s | new s | Δ vs gate |")
    lines.append("|---|---|---|---|")
    for name, ov, nv, note in movers:
        lines.append(
            f"| {name} | {ov if ov is not None else '—'} | {nv} | {note} |"
        )
    n_drift = len(drift)
    tot_drift = sum(t[2] - t[1] for t in drift)
    lines.append("")
    lines.append(
        f"{n_drift} further queries moved within their IQR gates "
        f"(ambient drift, net {tot_drift:+.1f}s — not narrated); "
        f"removed: {removed or 'none'}."
    )
    return movers, drift, "\n".join(lines)


def main(old_path: str | None = None, new_path: str | None = None) -> int:
    if old_path is None:
        blob = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:BENCH_FULL.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        old = json.loads(blob)
    else:
        old = _load(old_path)
    if new_path is None:
        new_path = os.path.join(REPO, "BENCH_FULL.json")
    new = _load(new_path)
    movers, drift, md = compare(old, new)
    print(md)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
