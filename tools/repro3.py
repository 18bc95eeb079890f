"""Config-3 (octree) TPU repro at reduced scale with phase timers.

Bisects the round-2 TPU fault/hang: runs the bench3 ski at small packet
counts and batch sizes, printing progress so a hang localizes to a phase.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    n_pk = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    max_events = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    from skirt9_tpu.config.ski import load_ski
    t0 = time.time()
    ski = os.path.join(HERE, "tests", "golden", "bench3.ski")
    sim = load_ski(ski, batch_size=batch, max_events=max_events,
                   num_packets=n_pk)
    sim.seed = 0
    print(f"loaded: ncells={sim.grid.ncells} max_steps={sim.options.max_steps} "
          f"t={time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    rf, accs = sim.run_primary(verbose=True)
    import jax
    jax.block_until_ready(jax.tree.leaves(accs))
    import numpy as np
    s = float(np.asarray(rf).sum())
    print(f"primary done t={time.time()-t0:.1f}s rf_sum={s:.4e}", flush=True)
    t0 = time.time()
    rate = n_pk / (time.time() - t0) if time.time() > t0 else 0
    # timed second run
    t0 = time.time()
    rf, accs = sim.run_primary(verbose=False)
    jax.block_until_ready(jax.tree.leaves(accs))
    dt = time.time() - t0
    print(f"primary timed: {n_pk/dt:,.0f} pk/s ({dt:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
