"""Generate the standard benchmark sequence (EuRoC on-disk format).

Real EuRoC cannot be downloaded in this environment, so the accuracy and
throughput A/B between this framework and the reference C++ binary
(native/refbench) runs on this deterministic synthetic sequence: MH_01-like
duration (180 s, 3600 frames @ 20 Hz, IMU @ 200 Hz, 752x480 imagery), a 3 s
stationary start for static initialization, EuRoC-realistic IMU noise
densities and constant biases, then ~1.3 m/s flight with roll/pitch wobble.

Usage: python scripts/make_bench_seq.py [out_dir] [n_frames]
Defaults: /tmp/orcvio_bench_seq 3600
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orcvio_bench_seq"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 3600

    # Render on CPU: deterministic across environments, and f64 time math.
    jax.config.update("jax_platforms", "cpu")

    from orcvio_tpu.dataio.euroc_writer import write_euroc_dataset, write_reference_config
    from orcvio_tpu.dataio.synthetic import SimConfig

    sim = SimConfig(
        n_frames=n_frames, frame_hz=20.0, imu_hz=200.0,
        static_time=3.0, ramp_time=1.5,
        height=4.0, radius=2.5, omega=0.5, seed=11,
        gyro_noise=0.0024, acc_noise=0.028,
    )
    marker = os.path.join(out, f".complete_{n_frames}")
    if os.path.exists(marker):
        print(f"{out} already generated ({n_frames} frames)")
        return
    info = write_euroc_dataset(out, sim)
    write_reference_config(os.path.join(out, "config.yaml"), sim,
                           output_dir="/tmp/refbench_cache/")
    with open(marker, "w") as f:
        f.write("ok")
    print(f"wrote {info['mav0']} ({n_frames} frames)")


if __name__ == "__main__":
    main()
