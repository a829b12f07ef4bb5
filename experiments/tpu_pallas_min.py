import time, numpy as np, jax
print("jax ready", jax.devices(), flush=True)
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
m = ac.build([(n, i) for i, n in enumerate(["tshirt","shirts","shorts"])])
eng = PallasAcEngine(m, n_streams=256, t_tile=128)
print("engine built", flush=True)
hay_small = (b"short tshirts and shorts " * 100)
t0=time.perf_counter()
got = eng.count(hay_small)
print("count:", got, "oracle:", ac.count_matches(m, hay_small), f"{time.perf_counter()-t0:.1f}s", flush=True)
