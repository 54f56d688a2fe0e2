#!/usr/bin/env python3
"""Ingest a hw_validate.sh session log into committed artifacts.

``scripts/hw_validate.sh`` runs the whole hardware-measurement sequence;
each harness prints machine-readable JSON lines to stdout.  This script
parses the session log and

 1. APPENDS every JSON record (tagged with its step) to
    ``BENCH_HW_SESSION.jsonl`` — the raw committed evidence is append-only
    so no ingest can destroy an earlier session's record (records whose
    payload is already present, e.g. rows `bench_configs.py` self-logged,
    are skipped);
 2. merges human-readable sections (real-time latency, host-fed streaming,
    pipelined-Jinc2 A/B, multi-stream serving, real-time sustain) into
    ``BENCH_DETAILS.md``, BEFORE the roofline section so a later
    ``bench_roofline.py`` re-run (which truncates at its own header) cannot
    eat them.

Usage:  python scripts/hw_ingest.py [/tmp/hw_session.log]

Pure text processing — no jax import, safe to run while a bench session
is still going (it ingests whatever steps have completed).
"""

from __future__ import annotations

import json
import os
import re
import sys

STEP_RE = re.compile(r"^=== \[(\d\d:\d\d:\d\d)\] (\d+)/\d+ (.*) ===$")
ROOF_HEADER = "## Roofline (analytic model vs v5e peaks)"

# Section headers owned by this script (replaced wholesale on re-ingest).
OWNED = [
    "## Real-time latency (batch-1, 1 chip)",
    "## Pipelined Jinc2 A/B (variant removed after this gate)",
    "## Host-fed streaming overlap",
    "## Multi-stream serving (one chip, trace-cache churn)",
    "## Real-time sustain (quality-managed pacing)",
]


def parse(path: str) -> list[dict]:
    records = []
    step = 0
    name = "preamble"
    with open(path) as f:
        for line in f:
            line = line.strip()
            m = STEP_RE.match(line)
            if m:
                step, name = int(m.group(2)), m.group(3)
                continue
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(rec, dict):
                rec["_step"] = step
                rec["_step_name"] = name
                records.append(rec)
    return records


def _dedup(rows: list[dict], keyfn) -> list[dict]:
    """Keep the LAST record per key (a re-run later in the log wins),
    preserving first-seen order of keys."""
    best = {}
    order = []
    for r in rows:
        k = keyfn(r)
        if k not in best:
            order.append(k)
        best[k] = r
    return [best[k] for k in order]


def _table(header: list[str], rows: list[list[str]]) -> list[str]:
    out = ["| " + " | ".join(header) + " |",
           "|" + "---|" * len(header)]
    out += ["| " + " | ".join(str(c) for c in r) + " |" for r in rows]
    return out


def sec_latency(recs: list[dict]) -> list[str]:
    rows = _dedup([r for r in recs if "latency_ms" in r and "config" in r],
                  lambda r: r["config"])
    if not rows:
        return []
    have_deep = all("interval_deep_ms" in r for r in rows)
    floors = [r["tunnel_floor_ms"] for r in recs
              if "tunnel_floor_ms" in r and "config" not in r]
    floor = floors[-1] if floors else None
    if have_deep:
        depth = rows[0].get("deep_queue", 32)
        body = _table(
            ["config", "latency ms (raw)", "interval ms (depth 2)",
             f"interval ms (depth {depth})", "60 Hz", "120 Hz"],
            [[r["config"], f"{r['latency_ms']:.2f}",
              f"{r['interval_ms']:.2f}", f"{r['interval_deep_ms']:.2f}",
              "**yes**" if r["realtime_60_dev"] else "no",
              "**yes**" if r["realtime_120_dev"] else "no"] for r in rows])
        foot = ("Raw latency and the depth-2 interval are dominated by the "
                "relay tunnel round trip here"
                + (f" (a NO-OP dispatch+sync measures {floor:.1f} ms min — "
                   "more than a full 4K tone-map dispatch at times)"
                   if floor else "") +
                f"; the depth-{depth} interval amortizes the round trip to "
                "<1 ms/frame and is the per-frame device cost a co-located "
                "host with a deep present queue sustains — the 60/120 Hz "
                "verdicts use it. ")
    else:
        body = _table(
            ["config", "latency ms", "min-max", "pipelined interval ms",
             "60 Hz", "120 Hz"],
            [[r["config"], f"{r['latency_ms']:.2f}",
              "{:.2f}-{:.2f}".format(*r["latency_minmax_ms"]),
              f"{r['interval_ms']:.2f}",
              "**yes**" if r["realtime_60"] else "no",
              "**yes**" if r["realtime_120"] else "no"] for r in rows])
        foot = ("Latency = one batch-1 dispatch, host-observed (includes "
                "the relay round trip here — on-node deployments see "
                "less). ")
    return [OWNED[0], ""] + body + [
        "", foot +
        "Interval = steady-state spacing with a depth-2 in-flight queue "
        "(the swap-chain analogue, how the reference hits refresh rate: "
        "Source/DX11VideoProcessor.cpp:2176-2197). A config holds 60/120 Hz "
        "when the pipelined interval beats 16.7/8.3 ms."]


def sec_jinc_ab(recs: list[dict], details_text: str) -> list[str]:
    rows = _dedup([r for r in recs
                   if r.get("_step") == 3 and "fps_median" in r],
                  lambda r: r["config"])
    if not rows:
        return []
    out_rows = []
    for r in rows:
        base = re.search(
            re.escape(r["config"]) + r":\s+\*\*([\d.]+) frames/s\*\*",
            details_text)
        base_fps = float(base.group(1)) if base else 0.0
        gain = (r["fps_median"] / base_fps - 1) * 100 if base_fps else 0.0
        out_rows.append(
            [r["config"].split(":")[0].split("(")[0].strip(),
             f"{base_fps:.1f}", f"{r['fps_median']:.1f}",
             f"{gain:+.1f}%", f"{r['psnr_db']:.2f}",
             "pass" if r["psnr_ok"] else "**FAIL**"])
    return [OWNED[1], ""] + _table(
        ["config", "baseline f/s", "pipelined f/s", "gain", "PSNR dB",
         "gate"], out_rows) + [
        "", "A/B of the 3-plane software-pipelined Jinc2 kernel (double-"
        "buffered VMEM staging of the next tile's W dots) against the table "
        "rows above, same PSNR gate. The variant was bit-exact in interpret "
        "mode and unit tests but corrupted tiles on hardware (a Mosaic "
        "scheduling hazard) — second gate failure, so the code path was "
        "deleted (hazard history: kernels/jinc2_pallas.py::_make_kernel3)."]


def sec_stream(recs: list[dict]) -> list[str]:
    rows = _dedup([r for r in recs
                   if "overlapped_fps" in r and "device_resident_fps" in r],
                  lambda r: r["metric"])
    if not rows:
        return []
    return [OWNED[2], ""] + _table(
        ["feed", "device-resident f/s", "overlapped f/s", "serial f/s",
         "overlap gain"],
        [[r["metric"].split(" host-fed")[0], r["device_resident_fps"],
          r["overlapped_fps"], r["serial_fps"],
          f"{(r['overlap_gain'] - 1) * 100:+.1f}%"] for r in rows]) + [
        "", "Host-fed = frames start as numpy on the host every batch "
        "(includes host->device transfer through the relay tunnel); "
        "overlapped = `runner.run_clip` issues batch k+1's transfer before "
        "batch k's compute is awaited; serial = strict put-then-compute. "
        "On-node PCIe deployments see a larger absolute feed rate; the "
        "overlap *gain* is the framework property being measured."]


def sec_multistream(recs: list[dict]) -> list[str]:
    summaries = [r for r in recs if r.get("metric") == "multistream_serving"]
    summary = summaries[-1] if summaries else None
    if summary is None:
        return []
    firsts = [r for r in recs if r.get("phase") == "first_open_compile_s"]
    first = firsts[-1] if firsts else {}
    per = first.get("per_stream", [])
    first_s = (f"{sorted(per)[len(per) // 2]:.2f} s median "
               f"(max {max(per):.2f} s)" if per else "n/a")
    return [OWNED[3], ""] + [
        f"- streams: **{summary['streams']}** distinct media types "
        "round-robined through one `VideoRenderer`",
        f"- first-open compile: {first_s} (cold trace per media type)",
        f"- cached re-open (retrace-free Configure): "
        f"**{summary['cached_switch_ms_median']} ms** median",
        f"- round-robin throughput: **{summary['round_robin_fps']} f/s** "
        f"vs single-stream {summary['single_stream_fps']} f/s",
        "", summary.get("note", "")]


def sec_realtime(recs: list[dict]) -> list[str]:
    rows = _dedup([r for r in recs if "sustained" in r and "drop_pct" in r],
                  lambda r: (r["config"], r["feed"], r["target_fps"],
                             r.get("queue_depth", 2)))
    bursts = _dedup([r for r in recs if "fields_per_s" in r],
                    lambda r: (r["config"], r.get("sync_every", 16)))
    if not rows and not bursts:
        return []
    out = [OWNED[4], ""]
    if rows:
        out += _table(
            ["config", "feed", "target", "depth", "frames", "dropped",
             "wall s", "sustained", "avg sync ms", "dev sync ms"],
            [[r["config"], r["feed"], f"{r['target_fps']} Hz",
              r.get("queue_depth", 2), r["frames"],
              f"{r['dropped']} ({r['drop_pct']}%)", r["wall_s"],
              "**yes**" if r["sustained"] else "no",
              r["avg_sync_offset_ms"], r["dev_sync_offset_ms"]]
             for r in rows])
    for r in bursts:
        out += ["", f"- {r['config']} burst-issue capacity: "
                f"**{r['fields_per_s']} fields/s** "
                f"({r['ms_per_field']} ms/field, sync every "
                f"{r.get('sync_every', 16)} presents) — 8.3 ms/field "
                "120 Hz contract device-side: "
                + ("**met**" if r.get("meets_120hz_contract")
                   else "**NOT met**")]
    return out + [
        "", "Plays N seconds of frames through `PresentClock.schedule` (the "
        "renbase2 quality loop); depth = present-confirmation interval "
        "(2 = the reference's swap-chain analogue, every present "
        "confirmed; larger depths amortize the ~26 ms relay sync round "
        "trip, which no co-located host pays). Sustained = zero drops "
        "and wall time within 2% of the clip duration. With the "
        "double-rate step jitted as one program (runner.push_batch), the "
        "c5 field chain SUSTAINS a device-fed 120 Hz (8.3 ms/field "
        "contract, Source/DX11VideoProcessor.cpp:2176-2197) at depth 16 "
        "with ~2 ms sync offsets; the depth-2 row times one tunnel round "
        "trip per present (labeled, environment floor). Single-frame "
        "feeds (c1/c4 rows) confirm every present individually, so their "
        "60 Hz rows stay tunnel-bound from this host; the 30 Hz rows "
        "(budget > floor) prove their sustained steady state, and the "
        "burst row the raw fields/s capacity ceiling."]


PROGRESS_NOTES_MARK = "## Notes (hand-maintained)"


def _cfg_sort_key(cfg: str):
    m = re.match(r"(\d+)([a-z]*)\.", cfg)
    return (int(m.group(1)), m.group(2)) if m else (99, cfg)


def gen_progress(progress_path: str = "PROGRESS.md",
                 jsonl_path: str = "BENCH_HW_SESSION.jsonl") -> bool:
    """Regenerate PROGRESS.md's measured headline + per-config table from
    the append-only session record, so the front-page numbers can never
    drift from the committed evidence again (VERDICT r4 weak #6: the r4
    headline lagged its own HEAD by three optimization commits).  The
    freshest record wins per config; anything below PROGRESS_NOTES_MARK
    is hand-maintained and preserved verbatim."""
    if not os.path.exists(jsonl_path):
        return False
    headline = None
    latest: dict[str, dict] = {}
    sustain120 = None
    with open(jsonl_path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "vs_baseline" in r and "value" in r:
                headline = r
            if "fps_median" in r and "config" in r and "error" not in r:
                latest[r["config"]] = r
            if (r.get("queue_depth") and r.get("target_fps") == 120.0
                    and r.get("sustained")):
                sustain120 = r
    lines = ["# Status — measured on real hardware (TPU v5e, 1 chip)",
             "",
             "*(generated by `scripts/hw_ingest.py --progress` from "
             "`BENCH_HW_SESSION.jsonl` — the append-only raw evidence; "
             "do not hand-edit above the notes marker)*", ""]
    if headline is not None:
        lines += [
            f"**Headline** (`bench.py`): **{headline['value']:.0f} f/s/chip** "
            f"{headline['metric'].split(' (')[0].replace(' frames/sec/chip', '')} @ "
            f"**{headline['psnr_db']} dB** vs the float64 oracle — "
            f"{headline['vs_baseline']:.2f}x the 600 f/s north-star.", ""]
    if latest:
        lines += ["## Per-config (freshest measurement per row)", "",
                  "| config | f/s median | min-max | PSNR dB |",
                  "|---|---|---|---|"]
        for cfg in sorted(latest, key=_cfg_sort_key):
            r = latest[cfg]
            lines.append(
                f"| {cfg} | **{r['fps_median']}** | "
                f"{r['fps_min']}-{r['fps_max']} | {r['psnr_db']} |")
        lines.append("")
    if sustain120 is not None:
        lines += [
            f"Real-time: device-fed **120 Hz double-rate deinterlacing "
            f"sustains** ({sustain120['frames']} fields, "
            f"{sustain120['dropped']} drops, "
            f"{sustain120['avg_sync_offset_ms']} ms avg sync offset, "
            f"confirmation depth {sustain120['queue_depth']}).", ""]
    lines += ["Full tables (latency, streaming overlap, multi-stream, "
              "sustain, roofline): `BENCH_DETAILS.md`. Raw session "
              "records: `BENCH_HW_SESSION.jsonl`.", ""]
    notes = ""
    if os.path.exists(progress_path):
        with open(progress_path) as f:
            text = f.read()
        if PROGRESS_NOTES_MARK in text:
            notes = text[text.index(PROGRESS_NOTES_MARK):]
    if not notes:
        notes = PROGRESS_NOTES_MARK + "\n"
    with open(progress_path, "w") as f:
        f.write("\n".join(lines) + "\n" + notes)
    return True


def merge(details_path: str, sections: list[list[str]]) -> None:
    with open(details_path) as f:
        text = f.read()
    # strip previously-owned sections (idempotent re-ingest)
    for hdr in OWNED:
        while hdr in text:
            i = text.index(hdr)
            nxt = [text.index(h, i + 1) for h in OWNED + [ROOF_HEADER]
                   if h in text[i + 1:]]
            j = min(x for x in nxt) if nxt else len(text)
            text = text[:i].rstrip() + "\n\n" + text[j:].lstrip()
    blob = "\n\n".join("\n".join(s) for s in sections if s)
    if ROOF_HEADER in text:
        i = text.index(ROOF_HEADER)
        text = (text[:i].rstrip() + "\n\n" + blob + "\n\n" +
                text[i:].rstrip() + "\n")
    else:
        text = text.rstrip() + "\n\n" + blob + "\n"
    tmp = details_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, details_path)


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--progress"]
    want_progress = "--progress" in sys.argv[1:]
    if not argv and want_progress:
        # progress-only mode: regenerate PROGRESS.md from the committed
        # evidence without ingesting a new session log
        if gen_progress():
            print("PROGRESS.md regenerated from BENCH_HW_SESSION.jsonl")
        return
    log = argv[0] if argv else "/tmp/hw_session.log"
    recs = parse(log)
    if not recs:
        print("no JSON records found in", log, file=sys.stderr)
        sys.exit(1)
    # append-only evidence file: skip records whose payload (ignoring the
    # bookkeeping "_" keys) already exists from a prior ingest or from
    # bench_configs.py's direct self-logging
    def payload(r: dict) -> str:
        return json.dumps({k: v for k, v in sorted(r.items())
                           if not k.startswith("_")})

    seen = set()
    if os.path.exists("BENCH_HW_SESSION.jsonl"):
        with open("BENCH_HW_SESSION.jsonl") as f:
            for line in f:
                try:
                    seen.add(payload(json.loads(line)))
                except (json.JSONDecodeError, AttributeError):
                    continue
    fresh = [r for r in recs if payload(r) not in seen]
    with open("BENCH_HW_SESSION.jsonl", "a") as f:
        for r in fresh:
            f.write(json.dumps(r) + "\n")
    with open("BENCH_DETAILS.md") as f:
        details_text = f.read()
    sections = [
        sec_latency(recs),
        sec_jinc_ab(recs, details_text),
        sec_stream(recs),
        sec_multistream(recs),
        sec_realtime(recs),
    ]
    merge("BENCH_DETAILS.md", sections)
    n = sum(1 for s in sections if s)
    print(f"ingested {len(recs)} records ({len(fresh)} new) -> "
          f"BENCH_HW_SESSION.jsonl, "
          f"{n} sections merged into BENCH_DETAILS.md")
    if want_progress and gen_progress():
        print("PROGRESS.md regenerated from BENCH_HW_SESSION.jsonl")


if __name__ == "__main__":
    main()
