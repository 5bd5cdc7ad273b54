"""Generate log/fuzz/REPORT.md from a fuzz campaign jsonl."""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "log/fuzz_r5/fuzz.jsonl"
out = sys.argv[2] if len(sys.argv) > 2 else "log/fuzz_r5/REPORT.md"

rows = [json.loads(l) for l in open(src)]
run = [r for r in rows if "skip" not in r]
clean = [r for r in run if r.get("clean")]
dirty = [r for r in run if not r.get("clean")]
coll = [r for r in run if r.get("is_collided")]
exc = [r for r in run
       if r.get("vel_excess_ratio") or r.get("acc_excess_ratio")]
crush = [r for r in run if r["A"] >= 40]
crush_clean = [r for r in crush if r.get("clean")]

with open(out, "w") as f:
    f.write("# OOD deadlock-fuzz report (round 5)\n\n")
    f.write(
        "Harness: tools/fuzz_missions.py — random forest/maze worlds "
        "(walls on the 0.5 m grid-node lattice), obstacle-clear "
        "connectivity-checked starts/goals (r5: world-bounds and "
        "box-clearance checks applied AFTER lattice rounding — two r4 "
        "\"deadlocks\" were unreachable goals manufactured by the "
        "generator). Mid campaign: 8-32 agents x BOTH forced layer "
        "modes; crush campaign: 40-64 agents (the regime excluded in "
        "r4) with the shipped auto layer.\n\n")
    f.write(f"- cases run: **{len(run)}**\n")
    f.write(f"- clean (finished, collision-free, zero excess): "
            f"**{len(clean)}** ({100*len(clean)//max(len(run),1)}%)\n")
    f.write(f"- collisions: **{len(coll)}**; dynamic-limit excess: "
            f"**{len(exc)}**\n")
    f.write(f"- crush regime (A ≥ 40): {len(crush_clean)}/{len(crush)} "
            f"clean\n")
    if dirty:
        f.write(f"- not-clean: {len(dirty)} — all flow timeouts with "
                f"clean safety audits\n\n")
        f.write("| seed | layer | A | kind | outcome |\n|---|---|---|---|---|\n")
        for r in sorted(run, key=lambda r: (r["seed"], r["layer"])):
            o = (f"{r['total_flight_time']:.1f} s" if r.get("clean")
                 else "TIMEOUT (no collision)")
            f.write(f"| {r['seed']} | {r['layer']} | {r['A']} | "
                    f"{r['kind']} | {o} |\n")
    else:
        f.write("- not-clean: **0**\n\n")
        f.write("| seed | layer | A | kind | flight |\n|---|---|---|---|---|\n")
        for r in sorted(run, key=lambda r: (r["seed"], r["layer"])):
            f.write(f"| {r['seed']} | {r['layer']} | {r['A']} | "
                    f"{r['kind']} | {r['total_flight_time']:.1f} s |\n")
print(f"wrote {out}: {len(clean)}/{len(run)} clean, "
      f"{len(coll)} collisions, crush {len(crush_clean)}/{len(crush)}")
