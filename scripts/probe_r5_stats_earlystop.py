"""Stats early-stop A/B: the rank pass at config-2/3 geometry."""
import json, time
import jax, jax.numpy as jnp, numpy as np
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.ops import sort_merge as sm

print("devices:", jax.devices(), flush=True)
NIT = 8
res = {}
for name, (lhs, rhs) in (("c2", (1_000_000, 100_000)),
                          ("c3", (1_000_000, 50_000))):
    probe = gen_probe_table(lhs, 1, rhs)
    k, p = gen_rhs_table(rhs, 2 if name == "c2" else 1)
    st = sm.build_sorted(k, p)
    rt = sm.rank_table(st)
    keys_flat = jax.device_put(jnp.asarray(probe[:, 0]))
    expected = None
    for flag in (False, True):
        sm.STATS_EARLY_STOP = flag

        @jax.jit
        def loop(p):
            def body(_, acc):
                bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
                mult, start = sm.sorted_match_ranks(
                    rt, p + bias, use_kernel=True)
                return acc + jnp.sum(mult.astype(jnp.int64))
            return jax.lax.fori_loop(0, NIT, body, jnp.int64(0))

        tot = int(loop(keys_flat))
        if expected is None:
            expected = tot
        assert tot == expected, (name, flag, tot, expected)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(keys_flat))
            best = min(best, time.perf_counter() - t0)
        ms = best / NIT * 1e3
        res[f"{name}_es{int(flag)}"] = round(ms, 3)
        print(f"{name} early_stop={flag}: {ms:.3f} ms "
              f"({lhs/(best/NIT)/1e6:.1f}M/s)", flush=True)
sm.STATS_EARLY_STOP = False
print(json.dumps(res), flush=True)
