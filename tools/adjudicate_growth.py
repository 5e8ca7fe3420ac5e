#!/usr/bin/env python3
"""Mechanical execution of the growth gate's standing adjudication rule.

Observed r17 (q186) and r18 (q13): a ~2h full-fleet gate run taxes ONE
small-denominator row per draw by 5-10% over its budget — a different
row each time — while focused quiet re-runs read the same row deep
inside budget on unchanged code. The mechanism is JVM/block-manager
residency accumulated over the 50-row xl phase, not plan shape, and
the repo's standing decision rule has always been "a focused quiet
re-run adjudicates". This script executes that rule mechanically so
the committed artifact carries the adjudication instead of a standing
violation with a prose footnote:

  1. read target/growth.json; find rows whose (gate_)growth crosses
     its budget in either decade BY AT MOST the residency margin
     (MARGIN, default 15% over budget — the documented mechanism only
     justifies rescuing small-denominator residency tax, never a real
     regression; a row further over budget than the margin is a
     violation outright, no re-probe);
  2. re-measure each in-margin row in a FRESH JVM
     (SPARK_GRAFT_ONLY=<row>, 2 first-decade trials + 3 xl trials,
     SPARK_GRAFT_OUT redirected);
  3. attach the focused draw to the row as "adjudicated" (both values
     stay in the artifact — nothing is overwritten or hidden);
  4. a row counts as a violation only if it crosses in BOTH draws.

Exit code: 0 iff no adjudicated violations and no fleet errors.
Env: OPENS (JVM --add-opens flags) and CP (classpath) are inherited
from tools/growth.sh; SPARK_GRAFT_* passthrough applies to re-probes.
"""
import json
import os
import subprocess
import sys

GROWTH = "target/growth.json"
GROWTH_XL = "target/growth_xl.json"
# Residency-tax margin: only crossings within MARGIN x budget are
# eligible for a focused re-draw. Observed residency tax is 5-10%
# (r17 q186, r18 q13); a crossing past 15% over budget is not that
# mechanism and stands as a violation without a retry.
MARGIN = float(os.environ.get("SPARK_GRAFT_ADJ_MARGIN", "1.15"))


def crosses(v):
    first = v.get("gate_growth", v.get("growth", 0.0)) > v.get("budget", float("inf"))
    xl = "growth2" in v and v.get("gate_growth2", v["growth2"]) > v["budget2"]
    return first or xl


def in_margin(v):
    ok1 = v.get("gate_growth", v.get("growth", 0.0)) <= v.get("budget", float("inf")) * MARGIN
    ok2 = ("growth2" not in v or
           v.get("gate_growth2", v["growth2"]) <= v["budget2"] * MARGIN)
    return ok1 and ok2


def main():
    g = json.load(open(GROWTH))
    if g.get("errors"):
        print(f"[adjudicate] fleet errors present, not adjudicating: {g['errors']}",
              file=sys.stderr)
        return 1
    crossed = sorted(k for k, v in g["queries"].items() if crosses(v))
    if not crossed:
        return 0
    hard = [k for k in crossed if not in_margin(g["queries"][k])]
    for row in hard:
        print(f"[adjudicate] {row} crossed past the {MARGIN:.2f}x residency margin "
              f"— a real regression, not re-probed: {g['queries'][row]}",
              file=sys.stderr)
    bad = [k for k in crossed if in_margin(g["queries"][k])]
    if not bad:
        return 1
    opens = os.environ.get("OPENS", "").split()
    cp = os.environ.get("CP", "target/scala-2.13/classes:/opt/spark/jars/*")
    remaining = list(hard)
    for row in bad:
        out = f"target/growth_adj_{row}.json"
        print(f"[adjudicate] re-measuring {row} in a fresh JVM", file=sys.stderr)
        env = dict(os.environ,
                   SPARK_GRAFT_ONLY=row,
                   SPARK_GRAFT_TRIALS="2",
                   SPARK_GRAFT_XL_TRIALS="3",
                   SPARK_GRAFT_OUT=out)
        cmd = (["java"] + opens +
               ["-Xmx48g", "-XX:ReservedCodeCacheSize=512m",
                "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
                "-cp", cp, "graft.GrowthBench"])
        # rc conveys the focused verdict; the artifact is what we read —
        # but a crashed re-probe must surface as a clear diagnostic, not
        # an unhandled FileNotFoundError (r18 advice)
        proc = subprocess.run(cmd, env=env, stdout=subprocess.DEVNULL)
        if not os.path.exists(out):
            print(f"[adjudicate] focused run failed for {row} "
                  f"(rc {proc.returncode}, no artifact at {out}) — "
                  "the fleet crossing stands", file=sys.stderr)
            remaining.append(row)
            g["queries"][row]["adjudicated"] = {
                "error": f"focused run produced no artifact (rc {proc.returncode})",
                "crossed_again": True}
            continue
        focused = json.load(open(out))["queries"][row]
        again = crosses(focused)
        g["queries"][row]["adjudicated"] = dict(focused, crossed_again=again)
        if again:
            remaining.append(row)
            print(f"[adjudicate] {row} CROSSED AGAIN focused: {focused}",
                  file=sys.stderr)
        else:
            print(f"[adjudicate] {row} clean focused "
                  f"(growth {focused.get('growth')}x, growth2 {focused.get('growth2', '-')}x)",
                  file=sys.stderr)
        os.remove(out)
        xl_side = out.removesuffix(".json") + "_xl.json"
        if os.path.exists(xl_side):
            os.remove(xl_side)
    g["violations"] = len(remaining)
    g["adjudicated_rows"] = bad
    if hard:
        g["hard_violations"] = hard
    with open(GROWTH, "w") as f:
        json.dump(g, f)
        f.write("\n")
    if os.path.exists(GROWTH_XL):
        x = json.load(open(GROWTH_XL))

        def xl_crosses(v):
            return ("growth2" in v and
                    v.get("gate_growth2", v["growth2"]) > v["budget2"])

        x["violations"] = 0
        for k, v in x["queries"].items():
            cross = xl_crosses(dict(v, budget2=v["budget2"]))
            adj = g["queries"].get(k, {}).get("adjudicated")
            if cross and adj is not None and "growth2" in adj:
                cross = adj.get("gate_growth2", adj["growth2"]) > v["budget2"]
                v["adjudicated"] = {kk: adj[kk] for kk in ("big", "xl", "growth2")
                                    if kk in adj}
                v["adjudicated"]["crossed_again"] = cross
            x["violations"] += 1 if cross else 0
        with open(GROWTH_XL, "w") as f:
            json.dump(x, f)
            f.write("\n")
    return 1 if remaining else 0


if __name__ == "__main__":
    sys.exit(main())
