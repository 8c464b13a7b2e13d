"""10-second box-regime probe: mean wall of a trivial 32-task job on
local[32]. The round-12 box is BIMODAL (~110-180 ms/job healthy,
400-700 ms/job degraded — noisy-neighbor wakeup latency); bench runs
taken in the degraded regime overstate job-count-heavy queries 2-6x.
Used to tag every measurement in OPTIMIZATION_r12.md with its regime.
"""
import time
from ml_data_wrangler_spark.session import get_spark

spark = get_spark(app_name="probe-regime", cpus=32)
sc = spark.sparkContext
sc.setLogLevel("ERROR")
sc.parallelize(range(32), 32).count()
samples = []
for _ in range(12):
    t0 = time.time()
    sc.parallelize(range(32), 32).count()
    samples.append((time.time() - t0) * 1000)
samples.sort()
med = samples[len(samples) // 2]
print(f"per-job ms: median {med:.0f} min {samples[0]:.0f} max {samples[-1]:.0f} "
      f"regime {'HEALTHY' if med < 250 else 'DEGRADED'}")
