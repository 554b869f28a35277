"""Generation-throughput batch sweep (the gen north star's lever study).

BASELINE.json's secondary metric is images/sec for 50-step DPM-Solver++
CFG generation (reference CLI: gen-images.py, batch 10 default —
/root/reference/gen-images.py:434,440). Throughput is a free function of
batch on TPU: the 50-step no-grad scan is one compiled program, and more
rows per matmul raise MXU occupancy until HBM runs out. This tool
measures img/s across batch sizes so bench.py's default (GenBench) is a
measured choice, not the reference's GPU-era default.

  python -m fairdiff.tools.bench_gen --batches 10,16,20 --timed 2

All programs AOT-compile in parallel threads first (remote compile
service overlaps them), then execute serially with one shared bf16
constant-filled param tree (weights don't change the math cost —
bench.fill_tree). Results go to PERF.md ("Generation north star").
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="10,16,20")
    ap.add_argument("--timed", type=int, default=2)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from bench import GenBench, fill_tree  # repo-root module

    batches = [int(b) for b in args.batches.split(",")]
    benches = {}
    errs = {}

    def compile_one(n: int) -> None:
        try:
            gb = GenBench(n)
            t0 = time.time()
            gb.aot_compile()
            print(f"# batch {n}: compiled in {time.time() - t0:.1f}s",
                  file=sys.stderr, flush=True)
            benches[n] = gb
        except Exception as e:  # noqa: BLE001
            errs[n] = repr(e)

    t0 = time.time()
    threads = [
        threading.Thread(target=compile_one, args=(n,)) for n in batches
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(f"# all compiles: {time.time() - t0:.1f}s", file=sys.stderr)

    params = None
    rows = []
    for n in batches:
        if n in errs:
            rows.append({"batch": n, "error": errs[n]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        gb = benches[n]
        if params is None:
            params = fill_tree(
                jax.eval_shape(gb.sd.init_params, jax.random.key(0)),
                bf16=True,
            )
        try:
            ips = gb.run(params, n_timed=args.timed, emit=False)
        except Exception as e:  # noqa: BLE001
            rows.append({"batch": n, "error": repr(e)})
            print(json.dumps(rows[-1]), flush=True)
            continue
        # 0.68 TFLOP per UNet image-forward (PERF.md speed-of-light note),
        # x2 CFG x steps, + ~1.2 TFLOP/img VAE decode; v5e peak ~197 TFLOPS
        tflop_per_img = 0.68 * 2 * args.steps + 1.2
        mfu = ips * tflop_per_img / 197.0
        rows.append({
            "batch": n,
            "img_per_s": round(ips, 3),
            "s_per_batch": round(n / ips, 2),
            "est_mfu": round(mfu, 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
