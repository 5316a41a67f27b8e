#!/usr/bin/env python3
"""Sentinel-normalized bench regression compare.

Operationalizes the reading rule from PLANS.md ("Round 14: bench
host-regime sentinel"): three rounds (r7, r12, r13) burned time
adjudicating whether a slower bench was a regression or a contended
host. The sentinel series answers the regime question; this tool does
the per-query arithmetic so the answer is a report, not an argument.

    python3 tools/benchdiff.py OLD.json NEW.json [--threshold 1.5] [--floor 0.3]

OLD/NEW are full-format bench artifacts (bench_full.json /
bench_lake*.json — the shape graft.Bench writes next to the repo).

Method:
  * regime ratio = NEW.sentinel_med / OLD.sentinel_med. The sentinel is
    a fixed data-independent workload, so any ratio > 1 is host noise,
    not engine change. NEW warms are divided by max(ratio, 1.0) before
    comparison — contention is normalized out, genuine regressions are
    NOT (an engine 2x on a quiet host has ratio ~1).
  * a query regresses when normalized_new / old > threshold AND the
    absolute delta > floor seconds (sub-floor queries jitter on JVM
    noise; a 0.05 s -> 0.12 s "2.4x" is not signal).
  * status changes are first-class: ok -> -1 (broken) always fails;
    ok <-> -2 (guard refusal) is reported — refusals are by design on
    beyond-fixture lakes, but an UNEXPECTED refusal transition should
    be read, not scrolled past.

Exit 0: no regressions. Exit 1: regression or breakage. Exit 2: usage.
Artifacts without a sentinel (pre-r14) compare unnormalized with a
warning — the ambiguity this tool exists to remove.
"""
import argparse
import json
import re
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        sys.exit(f"[benchdiff] {path}: not a full-format bench artifact "
                 "(no 'queries' key)")
    return d


def warm(v):
    # full format: {"cold":…, "warm":…, …}; tolerate bare numbers
    return v["warm"] if isinstance(v, dict) else float(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag when normalized new/old exceeds this (default 1.5)")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="ignore regressions smaller than this many seconds (default 0.3)")
    ap.add_argument("--divergence", action="store_true",
                    help="artifact-acceptance mode (r15 verdict #2): fail on "
                         ">threshold divergence in EITHER direction (a query "
                         "suddenly 2x FASTER than the committed artifact is "
                         "just as unexplained as one 2x slower), and print "
                         "the solo-probe adjudication command per flagged "
                         "query. Use --threshold 2.0 for acceptance.")
    a = ap.parse_args()

    old, new = load(a.old), load(a.new)
    co, cn = old.get("cpus"), new.get("cpus")
    if co != cn and (co or cn):
        print(f"[config] WARNING: artifacts ran at different CPU counts "
              f"({co} vs {cn}) — per-query ratios reflect parallelism, not "
              "engine change (round-14 lesson: a cpus=32 vs cpus=8 compare "
              "reads as a bimodal 2x 'regression' with a quiet sentinel)")
    fo, fn = old.get("force", "count"), new.get("force", "count")
    if fo != fn:
        print(f"[config] WARNING: artifacts used different evaluation "
              f"forcing ({fo} vs {fn}) — count-forced runs let Catalyst "
              "prune windows/generates/final sorts out of the timed plan "
              "(round-14 ForceAudit), so per-query deltas for the "
              "window/sketch families measure the forcing change, not the "
              "engine")
    so, sn = old.get("sentinel_med"), new.get("sentinel_med")
    if so and sn and so > 0:
        ratio = sn / so
        # one-sided clamp for the regression report (a quiet re-run must
        # not normalize real slowness away), but two-sided in divergence
        # mode: there both directions are unexplained, and a committed
        # artifact recorded under contention would otherwise flag a quiet
        # re-run's uniformly lower times as "faster" divergences that are
        # pure host regime (ADVICE r16)
        norm = ratio if a.divergence else max(ratio, 1.0)
        print(f"[regime] sentinel {so:.3f}s -> {sn:.3f}s (ratio {ratio:.2f}) "
              f"— normalizing NEW warms by {norm:.2f}"
              + ("  ** CONTENDED WINDOW **" if ratio > 1.3 else ""))
    else:
        norm = 1.0
        print("[regime] WARNING: sentinel series missing from one side — "
              "comparing unnormalized; contention and regression are "
              "indistinguishable in this report")

    oq, nq = old["queries"], new["queries"]
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"[added]   {len(added)}: {', '.join(added)}")
    if removed:
        print(f"[removed] {len(removed)}: {', '.join(removed)}")

    broken, refusal_changes, regressions, improvements = [], [], [], []
    pairs = {}
    for name in sorted(set(oq) & set(nq)):
        wo, wn = warm(oq[name]), warm(nq[name])
        if wo < 0 or wn < 0:
            if wo >= 0 and wn == -1:
                broken.append(name)
            elif (wo < 0) != (wn < 0) or wo != wn:
                refusal_changes.append((name, wo, wn))
            continue
        adj = wn / norm
        pairs[name] = (wo, wn, adj)
        if wo > 0 and adj / wo > a.threshold and adj - wo > a.floor:
            regressions.append((name, wo, wn, adj))
        elif adj > 0 and wo / adj > a.threshold and wo - adj > a.floor:
            improvements.append((name, wo, wn, adj))

    for name, wo, wn, adj in improvements:
        print(f"[faster]  {name}: {wo:.2f}s -> {wn:.2f}s "
              f"(normalized {adj:.2f}s, {wo/adj:.1f}x)")
    for name, wo, wn in refusal_changes:
        print(f"[status]  {name}: {wo} -> {wn} "
              "(guard-refusal transition — expected on lake-scale inputs "
              "for the pinned oracle anchors, read PLANS.md if elsewhere)")
    for name in broken:
        print(f"[BROKEN]  {name}: ok -> -1")
    for name, wo, wn, adj in regressions:
        print(f"[SLOWER]  {name}: {wo:.2f}s -> {wn:.2f}s "
              f"(normalized {adj:.2f}s, {adj/wo:.1f}x over threshold "
              f"{a.threshold})")

    tw_o, tw_n = old.get("total_warm"), new.get("total_warm")
    if tw_o and tw_n:
        print(f"[total]   warm {tw_o:.1f}s -> {tw_n:.1f}s "
              f"(normalized {tw_n / norm:.1f}s)")
    if a.divergence:
        # acceptance mode: improvements are divergences too — both
        # directions demand the same solo-probe adjudication before the
        # artifact is accepted (BENCH_r15's ann_ivf_maintain was 15x
        # SLOWER; its p01 was 4x slower; either sign is "two same-HEAD
        # artifacts disagree and nobody knows why")
        diverged = regressions + improvements
        # family-cluster rule (r16 verdict #6): r16's dedup family sat
        # at 1.7-1.95x — each under the 2x per-query gate, but TEN of
        # them moved together, which is a plan change, not jitter. When
        # >=3 same-family queries shift >=1.5x in the SAME direction
        # (past the floor), the whole cluster is flagged at 1.5x.
        flagged = {d[0] for d in diverged}
        clusters = {}
        for name, (wo, wn, adj) in pairs.items():
            if wo <= 0 or adj <= 0:
                continue
            up = adj / wo > 1.5 and adj - wo > a.floor
            dn = wo / adj > 1.5 and wo - adj > a.floor
            if up or dn:
                m = re.match(r"[a-z]+", name)
                famkey = (m.group(0) if m else name.split("_")[0], up)
                clusters.setdefault(famkey, []).append((name, wo, wn, adj))
        for (famname, up), members in sorted(clusters.items()):
            if len(members) >= 3:
                extra = [m for m in members if m[0] not in flagged]
                if extra:
                    print(f"[cluster] family '{famname}': {len(members)} "
                          f"queries moved >1.5x {'slower' if up else 'faster'} "
                          "together — flagging the whole cluster (a family "
                          "shift is a plan property, not jitter)")
                diverged = diverged + extra
        sf = new.get("sf", old.get("sf", "/root/testdata/sf0.1"))
        cpus = new.get("cpus", old.get("cpus", 32))
        for name, wo, wn, adj in diverged:
            r = max(adj / wo, wo / adj)
            print(f"[ADJUDICATE] {name}: {wo:.2f}s vs {wn:.2f}s "
                  f"(normalized {adj:.2f}s, {r:.1f}x) — run: "
                  f"SPARK_GRAFT_CPUS={cpus} sbt 'runMain "
                  f"graft.tools.ProbeQuery {name} {sf} 5'")
        if broken or diverged:
            print(f"[benchdiff] DIVERGENT: {len(broken)} broken, "
                  f"{len(diverged)} queries >{a.threshold}x off — "
                  "adjudicate (or re-run) before accepting this artifact")
            sys.exit(1)
        print(f"[benchdiff] ok: artifacts agree within {a.threshold}x "
              f"(+{a.floor}s floor) on every query")
        return
    if broken or regressions:
        print(f"[benchdiff] FAIL: {len(broken)} broken, "
              f"{len(regressions)} regressed")
        sys.exit(1)
    print("[benchdiff] ok: no sentinel-normalized regressions over "
          f"{a.threshold}x (+{a.floor}s floor)")


if __name__ == "__main__":
    main()
