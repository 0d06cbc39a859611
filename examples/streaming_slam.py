"""Live streaming SLAM — the reference's operating mode, TPU-engineered.

Equivalent of test_SLAM.m:16-18's ``while(1) s.runSlam()``: scans+odometry
arrive one tick at a time (here replayed from a scanlog or a fresh
simulation at a fixed arrival rate) and the session must keep up.  The
naive per-tick loop is capped at ~32 fps by the measured ~25-31 ms fixed
program-dispatch floor; the streaming driver (io/stream.py) micro-batches
arriving ticks into fused device programs with double-buffered async
dispatch and reports the latency the robot actually experiences.

Usage:
  python examples/streaming_slam.py [--log path.eksl] [--ticks 256]
      [--rate-hz 100] [--window 8] [--json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=None,
                    help="scanlog to replay (default: simulate)")
    ap.add_argument("--ticks", type=int, default=256)
    ap.add_argument("--rate-hz", type=float, default=100.0,
                    help="sensor arrival rate (0 = as fast as possible)")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--max-pending", type=int, default=2)
    ap.add_argument("--n-beams", type=int, default=720)
    ap.add_argument("--json", action="store_true",
                    help="print one JSON summary line to stdout")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ekf_slam_tpu.config import EKFParams, RansacParams, SimConfig
    from ekf_slam_tpu.io.stream import StreamingSlamSession
    from ekf_slam_tpu.session import SlamSession

    if args.log:
        from ekf_slam_tpu.io import scanlog
        odom, ranges = scanlog.read(args.log)
        T, B = ranges.shape
        beam_angles = np.linspace(0.0, 360.0, B, endpoint=False,
                                  dtype=np.float32)
    else:
        from ekf_slam_tpu.sim import world as W
        T, B = args.ticks, args.n_beams
        cfg = SimConfig(n_beams=B, max_range=12.0)
        room = W.rectangle_room(4.0, 3.0)
        traj = W.simulate(room, W.circle_controls(T, 0.05, 3.0), cfg,
                          jax.random.PRNGKey(0))
        odom = np.asarray(traj.odom)
        ranges = np.asarray(traj.ranges)
        beam_angles = np.asarray(traj.beam_angles)

    session = SlamSession(
        ekf_params=EKFParams(capacity=64, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float32),
        ransac_params=RansacParams(
            line_consensus=60, bearing_window_deg=15.0,
            wall_search_timeout=4, table_capacity=64, promote_count=5,
            ref_compat=False, n_hypotheses=64, dtype=jnp.float32),
        seed=1)
    stream = StreamingSlamSession(session, n_beams=B,
                                  beam_angles=beam_angles,
                                  window=args.window,
                                  max_pending=args.max_pending,
                                  first_odom=odom[0])

    # warm the window program off the clock (first jit compile through the
    # tunnel takes minutes and is not a latency statement)
    warm = min(args.window, T)
    for t in range(warm):
        stream.push(odom[t], ranges[t])
    stream.flush()
    stream.reset_stats()
    stream.carry = session.init_carry(first_odom=odom[0])

    period = 1.0 / args.rate_hz if args.rate_hz > 0 else 0.0
    done = 0
    t_next = time.perf_counter()
    for t in range(T):
        if period:
            now = time.perf_counter()
            if now < t_next:
                time.sleep(t_next - now)
            t_next += period
        done += len(stream.push(odom[t], ranges[t]))
    done += len(stream.flush())

    s = stream.stats.summary()
    s["window"] = args.window
    s["rate_hz"] = args.rate_hz
    s["completed"] = done
    if args.json:
        print(json.dumps(s))
    else:
        print(f"ticks={s['ticks']:.0f}  effective {s['ticks_per_sec']:.1f} "
              f"ticks/s  latency p50={s['latency_p50_ms']:.1f} ms  "
              f"p99={s['latency_p99_ms']:.1f} ms  "
              f"(window={args.window}, arrivals at "
              f"{args.rate_hz or 'unlimited'} Hz)")
    print(f"[stream] pose={np.asarray(stream.carry.filt.x[:3])} "
          f"landmarks={int(stream.carry.filt.n_active)}", file=sys.stderr)


if __name__ == "__main__":
    main()
