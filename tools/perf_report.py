"""Render a markdown digest of the remeasure artifacts.

Parses docs/r3_measurements/{clock_probe,bench,step_breakdown*,
ab_decisions}.txt and prints a digest (also written to SUMMARY.md in the
artifact dir) so the unattended chip window self-documents: clock
validity, the headline, the stage budget, and one table per re-validated
perf decision — ready to be folded into docs/PERF.md.

    python tools/perf_report.py [docs/r3_measurements]
"""

import json
import os.path as osp
import re
import sys


def read(path):
    try:
        with open(path) as f:
            return f.read()
    except OSError:
        return ""


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "docs/r3_measurements"
    lines = []
    w = lines.append

    w("# Honest-clock re-measurement digest\n")

    probe = read(osp.join(out, "clock_probe.txt"))
    if probe:
        w("## Clock probe (must be <= chip peak)\n```")
        w(probe.strip())
        w("```")
        vals = [float(m) for m in re.findall(
            r"value_fetch\s*:\s*([0-9.]+)", probe)]
        if vals and max(vals) <= 260:
            w("\nvalue-fetch rates are physically possible — clock VALID.\n")
        elif vals:
            w("\n**WARNING: value-fetch rate exceeds any plausible peak — "
              "do not trust the numbers below.**\n")

    bench = read(osp.join(out, "bench.txt"))
    m = re.search(r"\{.*\"metric\".*\}", bench)
    if m:
        try:
            j = json.loads(m.group(0))
            w("## Headline (bench.py)\n")
            w(f"- **{j.get('value'):,.0f} {j.get('unit')}** "
              f"(window band {j.get('window_min'):,.0f}–"
              f"{j.get('window_max'):,.0f}, {j.get('windows')} windows)")
            w(f"- MFU {j.get('mfu')} at {j.get('flops_per_example'):,.0f} "
              f"FLOP/example; {j.get('vs_baseline')}x the reference "
              f"protocol baseline\n")
        except (ValueError, TypeError):
            w("## Headline (bench.py)\n```\n" + bench.strip() + "\n```\n")

    for name, title in (("step_breakdown.txt", "Stage budget — dim 16"),
                        ("step_breakdown_128.txt",
                         "Stage budget — dim 128 (criteotb shapes)")):
        txt = read(osp.join(out, name))
        rows = re.findall(r"^(\S+)\s+([0-9.]+) us/step.*$", txt, re.M)
        if rows:
            w(f"## {title}\n")
            w("| step | us/step |")
            w("|---|---|")
            for k, v in rows:
                w(f"| {k} | {v} |")
            tail = [ln for ln in txt.splitlines() if "overhead" in ln]
            w("")
            lines.extend(tail)
            w("")

    ab = read(osp.join(out, "ab_decisions.txt"))
    decisions = []
    for ln in ab.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                decisions.append(json.loads(ln))
            except ValueError:
                pass
    if decisions:
        w("## Round-2 perf decisions, re-validated (interleaved windows)\n")
        for d in decisions:
            if "error" in d:
                w(f"- **{d.get('decision')}**: ERROR {d['error']}")
                continue
            meds = d.get("median_us_per_step", {})
            parts = ", ".join(f"{k} {v:,.1f}us" for k, v in meds.items())
            w(f"- **{d['decision']}** ({d.get('note', '')}): {parts} — "
              f"ratio {d.get('ratio')}")
        w("")

    text = "\n".join(lines) + "\n"
    print(text)
    with open(osp.join(out, "SUMMARY.md"), "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
