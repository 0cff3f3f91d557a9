#!/usr/bin/env python
"""NW app scaling harness — the plot_execution_times.py analog
(reference: CDP/NW/plot_execution_times.py runs ./nw over N = 2^5..2^15,
appends runtimes_*.txt, plots log-log speedups).

Runs the device NW matrix against the CPU gold across sizes, appends
runtimes files, and (with --plot) writes a log-log speedup figure."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-pow", type=int, default=11)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--out", default="runtimes_nw.txt")
    args = ap.parse_args()

    import jax.numpy as jnp

    from genomics_tpu.core import golds
    from genomics_tpu.models import nw
    from genomics_tpu.utils.timers import runtimes_file_append

    sizes, t_cpu, t_dev = [], [], []
    rng = np.random.default_rng(0)
    for p in range(5, args.max_pow + 1):
        N = 1 << p
        ref = rng.integers(0, 256, N).astype(np.uint8)
        qry = nw.generate_query(ref, rng)
        refd, qryd = jnp.asarray(ref), jnp.asarray(qry)
        m = nw.nw_matrix(refd, qryd)
        _ = np.asarray(m[-1, -1])  # warm/compile
        t0 = time.perf_counter()
        m = nw.nw_matrix(refd, qryd)
        _ = np.asarray(m[-1, -1])
        dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        gold = golds.nw_cpu(ref, qry) if N <= 4096 else None
        cpu = time.perf_counter() - t0 if gold is not None else float("nan")
        if gold is not None:
            assert np.asarray(m)[-1, -1] == gold[-1, -1]
        sizes.append(N)
        t_cpu.append(cpu)
        t_dev.append(dev)
        runtimes_file_append(args.out, f"N={N} device", dev)
        if gold is not None:
            runtimes_file_append(args.out, f"N={N} cpu", cpu)
        print(f"N={N}: device {dev*1e3:.1f} ms, cpu {cpu*1e3:.1f} ms")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.loglog(sizes, t_dev, "o-", label="device")
        plt.loglog(sizes, t_cpu, "s-", label="cpu gold")
        plt.xlabel("N")
        plt.ylabel("seconds")
        plt.legend()
        plt.grid(True, which="both", alpha=0.3)
        plt.savefig("nw_scaling.png", dpi=120)
        print("wrote nw_scaling.png")


if __name__ == "__main__":
    main()
