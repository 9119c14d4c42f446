#!/usr/bin/env python3
"""Regenerate SURVEY.md §4's "Realized numbers" block from committed
artifacts, so the published numbers can never drift from what the
bench and test runs actually produced.

Usage:
    python3 tools/survey_numbers.py [--bench BENCH.json] [--tests N]

--bench defaults to the highest-numbered BENCH_r*.json in the repo
root. --tests is the ScalaTest count ("Total number of tests run: N"
from `sbt -batch test`); if omitted, the existing count in the block
is kept. Rewrites the markers-delimited block in SURVEY.md in place.
"""
import argparse, glob, json, os, re, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SURVEY = os.path.join(ROOT, "SURVEY.md")
BEGIN = "<!-- BEGIN GENERATED NUMBERS (tools/survey_numbers.py) -->"
END = "<!-- END GENERATED NUMBERS -->"


def latest_bench():
    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not benches:
        sys.exit("no BENCH_r*.json found")
    return benches[-1]


def load_bench(bench_path):
    """Load a bench artifact in either format: the bench's own JSON line
    (has "queries"), or the harness wrapper {n, rc, cpus, sf, tail,
    parsed}. The wrapper's `parsed` is used when present; when it is
    null (the harness's tail window truncated the JSON line — observed
    r06/r07), we try to recover a complete JSON object from `tail`, and
    otherwise fall back to bench_local_last.json, which Bench.scala
    writes directly with full precision and no tail-window limit."""
    with open(bench_path) as f:
        b = json.load(f)

    def prefer_full(cand, path):
        """The round-9+ stdout line carries only a pinned HEADLINE
        subset (the full 177-key map overflows the harness tail
        window); when the local full-precision artifact has strictly
        more query keys, report from it instead."""
        fallback = os.path.join(ROOT, "bench_local_last.json")
        if os.path.exists(fallback):
            with open(fallback) as f:
                full = json.load(f)
            if len(full.get("queries", {})) > len(cand.get("queries", {})):
                print(f"note: {os.path.basename(path)} carries a headline"
                      " subset; using bench_local_last.json for the full"
                      " map", file=sys.stderr)
                return full, fallback
        return cand, path

    if "queries" in b:
        return prefer_full(b, bench_path)
    if isinstance(b.get("parsed"), dict) and "queries" in b["parsed"]:
        return prefer_full(b["parsed"], bench_path)
    tail = b.get("tail") or ""
    start = tail.find('{"metric"')
    if start >= 0:
        for end in range(len(tail), start, -1):
            try:
                cand = json.loads(tail[start:end])
            except ValueError:
                continue
            if "queries" in cand:
                return prefer_full(cand, bench_path)
    fallback = os.path.join(ROOT, "bench_local_last.json")
    if os.path.exists(fallback):
        print(f"note: {os.path.basename(bench_path)} is an unparsed harness"
              " wrapper; using bench_local_last.json", file=sys.stderr)
        with open(fallback) as f:
            return json.load(f), fallback
    sys.exit(f"{bench_path} has no usable bench JSON and no"
             " bench_local_last.json fallback exists")


def render(bench_path, tests):
    b, bench_path = load_bench(bench_path)
    queries = b["queries"]
    spread = b.get("query_spread", {})
    ok = {k: v for k, v in queries.items() if v >= 0}
    total = sum(ok.values())
    # streaming trigger scenarios are per-trigger COST measurements,
    # not queries — report them on their own line below
    nonstream = {k: v for k, v in ok.items() if not k.startswith("stream_")}
    slowest = max(nonstream or ok, key=(nonstream or ok).get)
    parts = [BEGIN,
             f"Realized numbers (generated from {os.path.basename(bench_path)}"
             " + the ScalaTest summary — regenerate with"
             " tools/survey_numbers.py, do not edit):",
             ""]
    timing = "median of 3 runs each" if spread else "one timed run each"
    parts.append(f"- {len(ok)} benched queries at sf0.1 / local[32]:"
                 f" {total:.1f} s total ({timing}).")
    if spread and slowest in spread:
        lo, hi = spread[slowest]
        parts.append(f"- Slowest query: {slowest} at {ok[slowest]:.2f} s"
                     f" median (spread {lo:.2f}-{hi:.2f} s).")
    else:
        parts.append(f"- Slowest query: {slowest} at {ok[slowest]:.2f} s.")
    eps = b.get("ingest_events_per_sec")
    if eps:
        parts.append(f"- Event-log ingest through the full parse path:"
                     f" {eps:,} events/sec best-of-3 (reference claims"
                     " 20-30k, README.md:13).")
    if tests:
        parts.append(f"- ScalaTest: {tests} tests passing.")
    shared = ok.get("dedup_family_shared")
    write = ok.get("shingle_store_write")
    cold = [ok.get(k) for k in ("dedup_ngram", "dedup_minhash", "dedup_simhash")]
    if shared is not None and all(c is not None for c in cold):
        line = (f"- Shared shingle store: ngram+minhash+simhash from one"
                f" materialized store run in {shared:.2f} s vs"
                f" {sum(cold):.2f} s as three cold queries"
                f" ({sum(cold) / shared:.2f}x)")
        if write is not None:
            line += (f"; the one-time store write is {write:.2f} s,"
                     f" amortized across every consumer of the store")
        parts.append(line + ".")
    trig, growths = [], []
    for fam, label in [("stream_trigger", "ngram"),
                       ("stream_exact_trigger", "exact"),
                       ("stream_simhash_trigger", "simhash"),
                       ("stream_simhash64_trigger", "simhash-wide"),
                       ("stream_minhash_trigger", "minhash"),
                       ("stream_emb_trigger", "embedding"),
                       ("stream_emb64_trigger", "embedding-wide"),
                       ("stream_cdc_trigger", "cdc"),
                       ("stream_span_trigger", "span"),
                       ("stream_cluster_trigger", "cluster-fold")]:
        q = ok.get(f"{fam}_quarter_corpus")
        f = ok.get(f"{fam}_full_corpus")
        if q is not None and f is not None:
            trig.append(f"{label} {q:.1f}/{f:.1f}")
            if q > 0:
                growths.append(100.0 * (f - q) / q)
    if trig:
        # Report the MEASURED quarter->full growth range, not a flatness
        # assertion: a trigger never re-reads corpus text (plan-audited),
        # but each keeps one O(state) columnar-scan term (its delta
        # store), so a 4x state store costs a few-to-tens-of-% more per
        # trigger, not 4x (round-8 VERDICT: the prose must match the
        # measurement).
        lo, hi = min(growths), max(growths)
        def pct(x):
            return f"{x:+.0f}%"
        parts.append("- Streaming trigger cost, quarter/full corpus seed (s): "
                     + ", ".join(trig)
                     + f" — measured quarter->full growth {pct(lo)}..{pct(hi)}"
                     " per trigger against a 4x state store: the corpus-text"
                     " term is zero (plan-audited), the residual growth is"
                     " each trigger's O(state) delta-store columnar scan.")
    eshared = ok.get("emb_family_shared")
    ewrite = ok.get("quantized_store_write")
    ecold = [ok.get(k) for k in ("dedup_embedding", "knn_graph", "emb_outliers")]
    if eshared is not None and all(c is not None for c in ecold):
        line = (f"- Shared quantized (ANN-index) store: embedding-dedup +"
                f" kNN-graph + cell-outliers from one materialized index run"
                f" in {eshared:.2f} s vs {sum(ecold):.2f} s as three cold"
                f" queries ({sum(ecold) / eshared:.2f}x)")
        if ewrite is not None:
            line += f"; the one-time index write is {ewrite:.2f} s"
        parts.append(line + ".")
    parts.append(END)
    return "\n".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench")
    ap.add_argument("--tests", type=int)
    ap.add_argument("--test-log", help="sbt test output; the count is parsed"
                    " from its 'Total number of tests run: N' line (beats"
                    " hand-typing --tests)")
    args = ap.parse_args()
    bench = args.bench or latest_bench()
    with open(SURVEY) as f:
        text = f.read()
    tests = args.tests
    if tests is None and args.test_log:
        with open(args.test_log) as f:
            m = re.search(r"Total number of tests run: (\d+)", f.read())
        if not m:
            sys.exit(f"no ScalaTest summary line in {args.test_log}")
        tests = int(m.group(1))
    if tests is None:
        m = re.search(r"ScalaTest: (\d+) tests passing", text)
        tests = int(m.group(1)) if m else None
    block = render(bench, tests)
    if BEGIN in text:
        text = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block,
                      text, flags=re.S)
    else:
        sys.exit(f"markers not found in SURVEY.md — add '{BEGIN}' ... '{END}'")
    with open(SURVEY, "w") as f:
        f.write(text)
    print(block)


if __name__ == "__main__":
    main()
