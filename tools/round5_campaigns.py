#!/usr/bin/env python
"""Round-5 evidence regeneration, chained in ONE process.

The tunneled v5e charges a multi-minute device-acquisition tax per
process (observed ~12 min before the first device op in every fresh
process this round), so the four campaign regens the round-4 VERDICT
demands run back-to-back inside one interpreter:

1. `runs/headline`       — midi headline campaign with the val gate
   active (VERDICT item 2) and the forest sigma=0.5 control grid
   (VERDICT item 4, headline half).
2. `runs/learn3d_window` / `runs/learn3d_scatter3d` — the two 3-D
   regressing families, regenerated with the selection gate so the
   committed tables carry `gate:`/`selected:` rows (VERDICT item 2).
3. `runs/headline_arm`   — the arm-transfer stage at XL scale through
   the reproduction wrapper (VERDICT item 3).

Each stage is independent: a failure is logged and the next stage still
runs.  Artifacts appear on disk as each stage completes, so partial
progress is committable.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import headline_campaign
import learn3d_campaign


def stage(name, fn):
    t0 = time.time()
    print(f"\n===== [{name}] start {time.strftime('%H:%M:%S')} =====",
          flush=True)
    try:
        fn()
        print(f"===== [{name}] OK in {time.time() - t0:.0f}s =====",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"===== [{name}] FAILED after {time.time() - t0:.0f}s =====",
              flush=True)


def main():
    only = sys.argv[1:] or ["headline", "learn3d_window",
                            "learn3d_scatter3d", "arm_xl"]
    if "headline" in only:
        stage("headline midi", lambda: headline_campaign.main(
            ["--out", "runs/headline", "--scale", "midi"]))
    if "learn3d_window" in only:
        stage("learn3d window", lambda: learn3d_campaign.main(
            ["--out", "runs/learn3d_window", "--family", "window",
             "--num_train", "60", "--num_test", "16", "--epochs", "10",
             "--seed", "0", "--size", "48", "--t", "20"]))
    if "learn3d_scatter3d" in only:
        stage("learn3d scatter3d", lambda: learn3d_campaign.main(
            ["--out", "runs/learn3d_scatter3d", "--family", "scatter3d",
             "--num_train", "60", "--num_test", "16", "--epochs", "10",
             "--seed", "0", "--size", "48", "--t", "20"]))
    if "arm_xl" in only:
        stage("arm xl", lambda: headline_campaign.main(
            ["--out", "runs/headline_arm", "--scale", "xl", "--arm-only"]))


if __name__ == "__main__":
    main()
