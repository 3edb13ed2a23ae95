#!/usr/bin/env python3
"""Per-query creep ledger, canary-normalized (r15 verdict #4).

The committed sf0.1 total walked 96.3 -> 101.1 s across r14->r15 with
each step attributed to box drift -- plausible each time, unfalsifiable
as a trend. This tool makes the trend mechanical: it diffs a bench
artifact against a committed best-ever per-query table
(BENCH_LEDGER.json), normalizing BOTH sides by their own artifact's
canary mean, and flags queries whose normalized time exceeds the
normalized best by more than a threshold (default 1.25x).

Normalization, two layers:
 1. canary: each side's seconds divide by its own artifact's canary
    mean (a fixed-size in-memory aggregation, see Bench.scala). This
    cancels gross box-speed differences but is BIASED when canary cost
    and query cost decouple -- the canary is a pure 32-way CPU burst,
    queries are shuffles+IO+codegen (r16 measurement: a box whose
    canary read 18% fast ran flat-raw control queries at ratio 1.45,
    flagging all 15 probed queries spuriously).
 2. drift: the MEDIAN canary-normalized ratio across all common
    queries (the r15 verdict's own drift estimator). Real creep is a
    few queries far above the median; residual box bias moves the
    median itself. Flags fire on the drift-ADJUSTED ratio.

Usage:
  python3 tools/creep.py                          # diff BENCH_full.json vs ledger
  python3 tools/creep.py --artifact BENCH_sf1.json --ledger BENCH_LEDGER_sf1.json
  python3 tools/creep.py --threshold 1.25
  python3 tools/creep.py --update --src r16       # fold current bests into the ledger
  python3 tools/creep.py --seed r14:f1.json r15:f2.json   # build a fresh ledger

Exit code: number of flagged queries, plus 1 if the drift itself
exceeds the threshold OR the tighter --drift-bound (default 1.15; a
uniform suite-wide slowdown below the threshold would otherwise hide
inside the median -- r16 advice) -- 0 = clean, so it can gate a round
close. A flagged query is either real creep (fix it), an
adjudicated change (record it in SCALE.md and --update the ledger on
the new tree), or measurement spread (confirm with an isolated
SPARK_GRAFT_ONLY run before believing it -- the canary under-corrects
sub-second queries; see README's ledger reading rule).

The ledger is seeded from BUILDER final-tree artifacts (the committed
r12-r15 bests). Diffing a DRIVER raw log (the BENCH_full.json a
"round N" commit carries can be a noisy re-run; see README on artifact
authority) is expected to flag broadly -- that is the tool correctly
reading box noise, not a gate failure. Gate on the artifact you just
regenerated on the finished tree.
"""
import argparse
import json
import statistics
import sys


def canary_mean(artifact):
    cs = artifact.get("canaries")
    if not cs:
        cs = [artifact.get("canary_before"), artifact.get("canary_after")]
        cs = [c for c in cs if c is not None]
    if not cs:
        raise SystemExit("artifact carries no canaries -- cannot normalize")
    return sum(cs) / len(cs)


def load(path):
    with open(path) as f:
        return json.load(f)


def entries(artifact, src):
    cm = canary_mean(artifact)
    return {
        q: {"sec": t, "canary": round(cm, 4), "norm": round(t / cm, 3), "src": src}
        for q, t in artifact["queries"].items()
        if t < 9000  # 9999.0 is Bench's all-reps-failed sentinel
    }


def merge(ledger, new):
    out = dict(ledger)
    for q, e in new.items():
        if q not in out or e["norm"] < out[q]["norm"]:
            # a new best supersedes the old entry INCLUDING any
            # "adjudicated" mark: the current tree beat the old best
            # head-to-head, so the suppression has nothing left to cover
            out[q] = e
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default="BENCH_full.json")
    ap.add_argument("--ledger", default="BENCH_LEDGER.json")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--drift-bound", type=float, default=1.15,
                    help="secondary bound on the drift itself: sub-threshold "
                         "uniform creep fails the gate instead of being "
                         "divided out of every ratio (r16 advice)")
    ap.add_argument("--update", action="store_true",
                    help="fold the artifact's normalized bests into the ledger")
    ap.add_argument("--src", default=None,
                    help="provenance tag for --update entries (e.g. r16); "
                         "defaults to the artifact's sf field")
    ap.add_argument("--seed", nargs="+", metavar="SRC:FILE",
                    help="(re)build the ledger from src:file artifact pairs")
    ap.add_argument("--adjudicate", nargs="+", metavar="QUERY:ANCHOR",
                    help="mark ledger entries as tree-vs-tree adjudicated "
                         "(e.g. q46_rp_lsh:SCALE.md#r17-box-era): the entry "
                         "stays the normalization best, but a flag against "
                         "it prints as ADJUDICATED and does not fail the "
                         "gate. The mark drops automatically when a newer "
                         "best replaces the entry (r17 verdict #5 -- stop "
                         "re-litigating box-era bests every round)")
    args = ap.parse_args()

    if args.seed:
        ledger = {}
        for pair in args.seed:
            src, sep, path = pair.partition(":")
            if not sep or not src or not path:
                raise SystemExit(f"--seed wants SRC:FILE pairs, got {pair!r}")
            ledger = merge(ledger, entries(load(path), src))
        with open(args.ledger, "w") as f:
            json.dump(dict(sorted(ledger.items())), f, indent=1)
        print(f"ledger seeded: {len(ledger)} queries -> {args.ledger}")
        return 0

    try:
        ledger = load(args.ledger)
    except FileNotFoundError:
        raise SystemExit(f"no ledger at {args.ledger} -- bootstrap one with "
                         "--seed SRC:FILE ...")

    if args.adjudicate:
        for pair in args.adjudicate:
            q, sep, anchor = pair.partition(":")
            if not sep or not q or not anchor:
                raise SystemExit(f"--adjudicate wants QUERY:ANCHOR pairs, got {pair!r}")
            if q not in ledger:
                raise SystemExit(f"--adjudicate: {q} not in {args.ledger}")
            ledger[q]["adjudicated"] = anchor
        with open(args.ledger, "w") as f:
            json.dump(dict(sorted(ledger.items())), f, indent=1)
        print(f"adjudicated {len(args.adjudicate)} entries -> {args.ledger}")
        return 0
    art = load(args.artifact)
    cur = entries(art, args.artifact)
    cm = canary_mean(art)
    print(f"{args.artifact}: canary_mean={cm:.4f}  "
          f"queries={len(cur)}  ledger={len(ledger)}  "
          f"threshold={args.threshold}x")

    ratios, new_queries = {}, []
    for q, e in sorted(cur.items()):
        if q not in ledger:
            new_queries.append(q)
        else:
            ratios[q] = e["norm"] / ledger[q]["norm"]
    if not ratios:
        raise SystemExit("no common queries between artifact and ledger")
    drift = statistics.median(ratios.values())
    print(f"drift (median ratio vs ledger best): {drift:.3f} -- "
          "flags are on the drift-ADJUSTED ratio")
    # a drift beyond the threshold is itself a finding: either the box is
    # far off its ledger-era state, or the TREE regressed uniformly --
    # the median would silently absorb the latter (r16 review). Counted
    # into the exit code so a round-close gate cannot pass through it.
    drift_alarm = drift > args.threshold
    if drift_alarm:
        print(f"WARNING: drift {drift:.2f} exceeds the {args.threshold}x "
              "threshold -- a uniform suite-wide slowdown is masked at this "
              "level. Run the isolated-control and tree-vs-tree checks "
              "(README ledger reading rule) before trusting 'clean'.")
    # sub-threshold uniform creep (r16 advice): a tree that got e.g. 20%
    # slower EVERYWHERE divides out of every per-query ratio via the
    # median, and the alarm above only fires past the full threshold.
    # A second, tighter bound on drift itself makes that band loud and
    # gate-failing; cross-session box drift is ~3-5% median on this box
    # (SCALE.md), so a 1.15 default leaves headroom for honest box
    # state while refusing to silently absorb a real uniform slowdown.
    # Adjudicate a firing the same way as a flag: isolated controls,
    # then tree-vs-tree if the controls move too.
    drift_creep = (not drift_alarm) and drift > args.drift_bound
    if drift_creep:
        print(f"DRIFT-CREEP: drift {drift:.3f} exceeds the secondary "
              f"{args.drift_bound}x bound -- every per-query ratio was "
              "adjusted by this factor, so a uniform tree-wide slowdown "
              "of this size would read 'clean'. Adjudicate with isolated "
              "untouched-control runs (README ledger reading rule).")
    flagged, suppressed, canary_inverted = [], [], []
    for q, ratio in ratios.items():
        adj = ratio / drift
        if adj > args.threshold:
            if ratio < 1.0:
                # r18 verdict #8: a query whose RAW seconds-per-canary
                # ratio is < 1.0 got FASTER than its ledger best -- the
                # adjusted ratio only exceeds the threshold because the
                # canary era moved (erratic canary inverting the
                # normalization). Definitionally not creep; print as
                # INFO so the era shift stays visible without costing
                # an adjudication cycle.
                canary_inverted.append((q, adj, ratio, cur[q], ledger[q]))
            elif ledger[q].get("adjudicated"):
                suppressed.append((q, adj, ratio, cur[q], ledger[q]))
            else:
                flagged.append((q, adj, ratio, cur[q], ledger[q]))
    for q, adj, ratio, e, b in sorted(flagged, key=lambda x: -x[1]):
        print(f"FLAG {q}: {adj:.2f}x (raw {ratio:.2f}x) normalized best "
              f"(now {e['sec']:.2f}s/cny{e['canary']} = {e['norm']}; "
              f"best {b['sec']:.2f}s/cny{b['canary']} = {b['norm']} @{b['src']})")
    for q, adj, ratio, e, b in sorted(canary_inverted, key=lambda x: -x[1]):
        print(f"INFO {q}: adj {adj:.2f}x but raw {ratio:.2f}x < 1.0 -- "
              f"at or below its normalized best ({e['sec']:.2f}s/cny"
              f"{e['canary']} vs {b['sec']:.2f}s/cny{b['canary']} "
              f"@{b['src']}); canary-era inversion, not creep")
    for q, adj, ratio, e, b in sorted(suppressed, key=lambda x: -x[1]):
        print(f"ADJUDICATED {q}: {adj:.2f}x vs {b['norm']} @{b['src']} -- "
              f"suppressed per {b['adjudicated']} (tree-vs-tree proven "
              "box-era; beats the gate only by superseding the best)")
    if new_queries:
        print(f"new (not in ledger): {', '.join(new_queries)}")
    if not flagged:
        print("clean: no query >%.0f%% above its drift-adjusted "
              "canary-normalized best" % ((args.threshold - 1) * 100))

    if args.update:
        src = args.src or art.get("sf", args.artifact)
        merged = merge(ledger, {q: dict(e, src=src) for q, e in cur.items()})
        with open(args.ledger, "w") as f:
            json.dump(dict(sorted(merged.items())), f, indent=1)
        print(f"ledger updated -> {args.ledger}")
    return len(flagged) + (1 if (drift_alarm or drift_creep) else 0)


if __name__ == "__main__":
    sys.exit(main())
