"""split1 chip A/B at config-1 wide geometry + skip 3/4."""
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
order = np.argsort(wide_keys, kind="stable")
cpay = np.concatenate([[0], np.cumsum(payloads[order])])
expected_chk = int((cpay[hi] - cpay[lo]).sum())
t_wide = sm.build_sorted(wide_keys, payloads)
probe_wide = jax.device_put(jnp.asarray(wide_probe))
sm.WIDE_COUNT_ROUTE = "split1"

res = {}
for skip in (None, 4):
    sm.SKIP_LEVELS_OVERRIDE = skip
    fn = lambda p: sm.sorted_match_totals(t_wide, p, use_kernel=True)
    c1, chk1 = jax.jit(fn)(probe_wide)
    assert int(c1) == expected, (skip, int(c1), expected)
    assert int(chk1) == expected_chk

    @jax.jit
    def loop(p):
        def body(_, acc):
            bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
            c, chk = fn(p + bias)
            return acc + c
        return jax.lax.fori_loop(0, NITER, body, jnp.int64(0))

    assert int(loop(probe_wide)) == NITER * expected
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(probe_wide))
        best = min(best, time.perf_counter() - t0)
    ms = best / NITER * 1e3
    res[f"split1_skip{skip}"] = round(ms, 2)
    print(f"split1 skip {skip}: {ms:.2f} ms "
          f"({N_PROBE/(best/NITER)/1e6:.1f}M/s)", flush=True)
sm.SKIP_LEVELS_OVERRIDE = None
print(json.dumps(res), flush=True)
