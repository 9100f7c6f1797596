"""Generate the workload trace assets (reference exp/{model}/qps_*.csv).

The reference ships pre-generated Poisson traces; these are regenerated from
sduss_tpu.benchmark.traces with the same schema (arrival_ms, resolution,
steps) plus the resolution-distribution variants.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sduss_tpu.benchmark.traces import generate_trace, save_trace

SPECS = {
    "sdxl": {"resolutions": (512, 768, 1024), "qps": (0.8, 0.9, 1.0, 1.1, 1.2),
             "steps": 50},
    "sd3": {"resolutions": (512, 768, 1024), "qps": (0.1, 0.2, 0.3, 0.4, 0.5),
            "steps": 40},
    "sd15": {"resolutions": (256, 512, 768), "qps": (1.0, 2.0, 3.0),
             "steps": 50},
}


def main(out_root="exp", num_requests=500):
    for family, spec in SPECS.items():
        d = os.path.join(out_root, family)
        os.makedirs(d, exist_ok=True)
        for qps in spec["qps"]:
            rows = generate_trace(qps, num_requests, spec["resolutions"],
                                  steps=spec["steps"], seed=int(qps * 100))
            save_trace(rows, os.path.join(d, f"qps_{qps}.csv"))
        for dist in ("small", "medium", "large"):
            rows = generate_trace(spec["qps"][len(spec["qps"]) // 2],
                                  num_requests, spec["resolutions"],
                                  distribution=dist, steps=spec["steps"],
                                  seed=hash(dist) % 1000)
            save_trace(rows, os.path.join(d, f"qps_mid_{dist}.csv"))
    print(f"traces written under {out_root}/")


if __name__ == "__main__":
    main()
