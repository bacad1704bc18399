"""Calibration run of the new bench gates (adversarial + fallback) on the
live backend -- checks tolerances/depths before the driver runs them."""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_adversarial_gate, bench_fallback_gate

out = {}
for name, fn in [("adv", bench_adversarial_gate),
                 ("fallback", bench_fallback_gate)]:
    try:
        r = fn()
        out.update(r)
        print(name, json.dumps(r), flush=True)
    except Exception as e:
        out[f"{name}_error"] = f"{type(e).__name__}: {e}"
        print(name, "ERROR", type(e).__name__, e, flush=True)
print(json.dumps(out))
