"""Round-5 final wide-key A/B (PERF_NOTES "split1"): split1 vs
packed control, 4 interleaved rounds, same session.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
       python -u scripts/probe_r5_split1_ab.py
"""
import json, time
import jax, jax.numpy as jnp, numpy as np
from ccve_tpu.ops import sort_merge as sm

print("devices:", jax.devices(), flush=True)
N_BUILD, N_PROBE, NITER = 1_000_000, 1 << 24, 8
rng = np.random.default_rng(1)
wide_keys = rng.integers(0, 2**40, N_BUILD, dtype=np.int64)
wide_probe = np.concatenate([
    rng.choice(wide_keys, N_PROBE // 2),
    rng.integers(0, 2**40, N_PROBE - N_PROBE // 2, dtype=np.int64),
])
rng.shuffle(wide_probe)
payloads = rng.integers(0, 2**30, N_BUILD, dtype=np.int64)
sk = np.sort(wide_keys)
lo = np.searchsorted(sk, wide_probe, "left")
hi = np.searchsorted(sk, wide_probe, "right")
expected = int((hi - lo).sum())
t_wide = sm.build_sorted(wide_keys, payloads)
probe_wide = jax.device_put(jnp.asarray(wide_probe))
narrow_keys = np.arange(N_BUILD, dtype=np.int64)
narrow_probe = rng.integers(0, 2 * N_BUILD, N_PROBE, dtype=np.int64)
t_narrow = sm.build_sorted(narrow_keys, payloads)
probe_narrow = jax.device_put(jnp.asarray(narrow_probe.astype(np.int32)))
sm.WIDE_COUNT_ROUTE = "split1"


def make_loop(table, probe, exp):
    fn = lambda p: sm.sorted_match_totals(table, p, use_kernel=True)
    if exp is not None:
        assert int(jax.jit(fn)(probe)[0]) == exp

    @jax.jit
    def loop(p):
        def body(_, acc):
            bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
            c, chk = fn(p + bias)
            return acc + c
        return jax.lax.fori_loop(0, NITER, body, jnp.int64(0))

    int(loop(probe))
    def timed():
        t0 = time.perf_counter()
        int(loop(probe))
        return (time.perf_counter() - t0) / NITER
    return timed

wide_t = make_loop(t_wide, probe_wide, expected)
packed_t = make_loop(t_narrow, probe_narrow, None)
ws, ps_ = [], []
for r in range(4):
    ws.append(wide_t())
    ps_.append(packed_t())
    print(f"round {r}: split1 {ws[-1]*1e3:.2f} packed {ps_[-1]*1e3:.2f} "
          f"ratio {ws[-1]/ps_[-1]:.3f}", flush=True)
res = {
    "split1_best_ms": round(min(ws) * 1e3, 2),
    "packed_best_ms": round(min(ps_) * 1e3, 2),
    "ratio_best": round(min(ws) / min(ps_), 3),
    "ratio_rounds": [round(w / p, 3) for w, p in zip(ws, ps_)],
}
print(json.dumps(res), flush=True)
