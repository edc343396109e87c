"""Wide STATS route chip A/B: limb vs split1 at 1M/2^24, 2^40 span."""
import json, time
import jax, jax.numpy as jnp, numpy as np
from ccve_tpu.ops import sort_merge as sm

print("devices:", jax.devices(), flush=True)
N_BUILD, N_PROBE, NIT = 1_000_000, 1 << 24, 4
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

res = {}
for route in ("limb", "split1"):
    sm.WIDE_STATS_ROUTE = route

    @jax.jit
    def loop(p):
        def body(_, acc):
            bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
            st = sm.sorted_match_stats(t_wide, p + bias, use_kernel=True)
            return acc + jnp.sum(st.mult.astype(jnp.int64))
        return jax.lax.fori_loop(0, NIT, body, jnp.int64(0))

    tot = int(loop(probe_wide))
    assert tot == NIT * expected, (route, tot)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(probe_wide))
        best = min(best, time.perf_counter() - t0)
    ms = best / NIT * 1e3
    res[route] = round(ms, 2)
    print(f"{route}: {ms:.2f} ms ({N_PROBE/(best/NIT)/1e6:.1f}M/s)",
          flush=True)
sm.WIDE_STATS_ROUTE = "limb"
print(json.dumps(res), flush=True)
