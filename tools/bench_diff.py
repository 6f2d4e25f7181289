#!/usr/bin/env python3
"""Diff two graft.Bench artifacts in CALIBRATED units.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--threshold=1.3]
                                   [--abs-ms=150] [--names=REGISTRY.json]

Each artifact is the bench's stdout (or a saved BENCH_r*_local.json): the
line carrying "queries" is parsed; "calibration_sec" (present since r19)
normalizes per-key times so host-throughput drift divides out. A key's
calibrated time is key_sec / calibration_sec (dimensionless multiples of
the fixed probe workload); the mover test is the project's standing rule
— ratio > threshold AND absolute growth > abs-ms, both measured in the
OLD run's seconds (calibrated delta re-scaled by the OLD calibration), so
"+150 ms" keeps meaning wall-clock milliseconds of the baseline round.
Artifacts without calibration_sec (pre-r19) fall back to 1.0 and the
report is marked UNCALIBRATED — interpret cross-round totals as
environment samples, per the r13/r17 bench notes.

DRIVER artifacts (BENCH_r*.json written by the round driver) keep only a
~2000-char "tail" of the bench stdout, which truncates the per-query
record's HEAD — only the alphabetically-LAST keys survive, but the
self-contained "total_summary" line always does (it is emitted last for
exactly this reason). When a file parses as whole-file JSON carrying
"tail" instead of "queries", the loader reconstructs a PARTIAL record:
calibration and total from the total_summary line, per-query times from
(in coverage order) the "queries_vec" value vector paired with --names,
any complete "queries_part" lines in the tail, and whatever torn
`"name":sec` pairs survive. The report marks such inputs `partial(tail)`
and the key count tells you the visible subset — per-key conclusions
then apply to the tail-visible keys only, while the calibrated TOTAL
comparison is complete.

--names=REGISTRY.json names the query keys for "queries_vec"
reconstruction: any JSON object whose top-level keys are the round's
query names (CORRECTNESS_r*.json is the canonical choice — the vec is
the f3 values in sorted-key order, so the sorted registry keys ARE the
positions). With --names and a tail that holds the vec line (it is
emitted right before total_summary precisely so it survives), the
reconstruction is COMPLETE, not partial.
"""
import json
import re
import sys


def load(path, names=None):
    # saved BENCH_r*_local.json artifacts are pretty-printed whole-file
    # JSON; raw bench stdout is one record per line amid log noise;
    # driver BENCH_r*.json artifacts hold a truncated stdout "tail"
    with open(path) as f:
        text = f.read()
    try:
        rec = json.loads(text)
        if "queries" in rec:
            return rec
        if "tail" in rec:
            return load_driver_tail(rec, path, names)
    except json.JSONDecodeError:
        pass
    best = None
    parts = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or '"queries"' not in line:
                continue
            # artifacts may embed the JSON line inside driver log noise
            start = line.find('{"metric"')
            if start < 0:
                continue
            try:
                rec = json.loads(line[start:])
            except json.JSONDecodeError:
                continue
            if rec.get("metric") == "queries_part":
                parts.update(rec["queries"])
            elif "queries" in rec:
                best = rec
    if best is None and parts:
        best = {"queries": parts, "partial": True}
    if best is None:
        sys.exit(f"error: no line with a \"queries\" record in {path}")
    return best


def load_driver_tail(rec, path, names=None):
    """Reconstruct a (partial) bench record from a driver artifact's
    truncated stdout tail: total_summary line, then per-key coverage from
    queries_vec (+--names), complete queries_part lines, torn pairs."""
    tail = rec["tail"]
    out = {"partial": True}
    m = re.search(r'\{"metric":"total_summary".*?\}', tail)
    if not m:
        sys.exit(f"error: driver artifact {path} has no total_summary "
                 "line in its tail — tail too short even for the summary")
    summary = json.loads(m.group(0))
    out.update({k: summary[k] for k in
                ("value", "reps", "calibration_sec", "calibration_vec",
                 "n_queries", "n_failed", "sf") if k in summary})
    queries = {}
    # torn `"name":sec` pairs anywhere in the tail (head-truncated records,
    # torn part lines) — complete records below override them
    for name, sec in re.findall(r'"(q_[A-Za-z0-9_]+)":(-?\d+(?:\.\d+)?)', tail):
        queries[name] = float(sec)
    # complete self-contained queries_part lines override torn pairs
    for pm in re.finditer(r'\{"metric":"queries_part"[^\n]*\}', tail):
        try:
            queries.update(json.loads(pm.group(0))["queries"])
        except json.JSONDecodeError:
            pass
    # the compact value vector (sorted-key order) + --names completes it
    vm = re.search(r'\{"metric":"queries_vec"[^\n]*\}', tail)
    if vm and names:
        vec = json.loads(vm.group(0))
        keys = sorted(names)
        if len(keys) == vec["n"] == len(vec["values"]):
            queries.update(zip(keys, (float(v) for v in vec["values"])))
            out["partial"] = False  # full per-query coverage reconstructed
        else:
            print(f"warn: queries_vec n={vec['n']} != {len(keys)} --names "
                  f"keys — vec skipped for {path}", file=sys.stderr)
    return {**out, "queries": queries}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=", 1)[1] if "=" in a else None
            for a in sys.argv[1:] if a.startswith("--")}
    if len(args) != 2:
        sys.exit(__doc__)
    threshold = float(opts.get("--threshold") or 1.3)
    abs_s = float(opts.get("--abs-ms") or 150) / 1000.0
    names = None
    if opts.get("--names"):
        with open(opts["--names"]) as f:
            names = list(json.load(f).keys())
    old, new = load(args[0], names), load(args[1], names)
    cal_o = old.get("calibration_sec")
    cal_n = new.get("calibration_sec")
    calibrated = cal_o is not None and cal_n is not None
    co = cal_o if calibrated else 1.0
    cn = cal_n if calibrated else 1.0
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    only_o = sorted(set(qo) - set(qn))
    only_n = sorted(set(qn) - set(qo))

    mode = 'CALIBRATED' if calibrated else 'UNCALIBRATED (missing calibration_sec)'
    parts = [p for p, r in (("old", old), ("new", new)) if r.get("partial")]
    if parts:
        mode += f" — partial(tail): {', '.join(parts)} (per-key rows cover tail-visible keys only)"
    print(f"mode: {mode}")
    if calibrated:
        print(f"calibration: old={cal_o:.3f}s new={cal_n:.3f}s "
              f"(host drift x{cal_n / cal_o:.3f})")
        for tag, r in (("old", old), ("new", new)):
            vec = r.get("calibration_vec")
            if vec:
                spread = (max(vec) - min(vec)) / min(vec) * 100
                print(f"  {tag} probe vector: n={len(vec)} "
                      f"[{min(vec):.3f}..{max(vec):.3f}]s spread {spread:.0f}%")
    for tag, r in (("old", old), ("new", new)):
        if r.get("partial") and "value" in r:
            print(f"  {tag} driver total_summary: {r['value']:.2f}s over "
                  f"{r.get('n_queries', '?')} keys, {r.get('n_failed', '?')} failed")
    sum_o = sum(qo[k] for k in common if qo[k] >= 0)
    sum_n = sum(qn[k] for k in common if qn[k] >= 0)
    print(f"common keys: {len(common)}  raw totals: {sum_o:.2f}s -> {sum_n:.2f}s "
          f"(x{sum_n / sum_o:.3f})" if sum_o else "")
    if calibrated and sum_o:
        print(f"calibrated totals: {sum_o / co:.2f} -> {sum_n / cn:.2f} probe-units "
              f"(x{(sum_n / cn) / (sum_o / co):.3f})")

    movers = []
    for k in common:
        to, tn = qo[k], qn[k]
        if to < 0 or tn < 0:
            movers.append((float("inf"), k, to, tn, "FAILED in one run"))
            continue
        co_t, cn_t = to / co, tn / cn
        # either side at 0.000 (f3-rounded sub-ms query) has no meaningful
        # ratio — and 1/ratio below must never divide by zero
        if co_t <= 0 or cn_t <= 0:
            continue
        ratio = cn_t / co_t
        # absolute growth re-scaled into the OLD run's wall-clock seconds
        delta_old_s = (cn_t - co_t) * co
        if ratio > threshold and delta_old_s > abs_s:
            movers.append((ratio, k, to, tn,
                           f"x{ratio:.2f} (+{delta_old_s * 1000:.0f} ms cal.)"))
        elif 1.0 / ratio > threshold and -delta_old_s > abs_s:
            movers.append((ratio, k, to, tn,
                           f"x{ratio:.2f} ({delta_old_s * 1000:.0f} ms cal.)"))
    movers.sort(key=lambda m: -abs(m[0] - 1.0) if m[0] != float("inf") else -1e9)
    if movers:
        print(f"\nmovers (ratio > {threshold} and |delta| > {abs_s * 1000:.0f} ms, calibrated):")
        for _, k, to, tn, note in movers:
            print(f"  {k}: {to:.3f}s -> {tn:.3f}s  {note}")
    else:
        print(f"\nno movers past ratio {threshold} + {abs_s * 1000:.0f} ms (calibrated)")
    if only_o:
        print(f"\nremoved keys: {', '.join(only_o)}")
    if only_n:
        print(f"added keys: {', '.join(only_n)}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piping into `head` is a normal way to read this
        pass
