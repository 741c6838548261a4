"""Can two processes share the axon-tunneled TPU chip?

Runs a chained-matmul workload (each step feeds the next, the only timing
mode the tunnel reports faithfully — CLAUDE.md) and prints steps/s.  Launch
one copy, note the rate; launch two concurrently, compare.  If aggregate
throughput across two processes >> one process's rate, quality runs can
overlap on the chip.
"""
import sys
import time

import jax
import jax.numpy as jnp


@jax.jit
def step(x):
    for _ in range(8):
        x = jnp.tanh(x @ x) + 0.01
    return x


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    x = jnp.ones((4096, 4096), jnp.bfloat16) * 0.01
    x = step(x)
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(x)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"pid-rate {n / dt:.2f} steps/s ({dt:.1f}s total)")


if __name__ == "__main__":
    main()
