"""track_level is 23us standalone but KLT is 5.3ms in-program. Bisect the
composition: pyr_track, forward_backward_track, process_frame-minus-filter.
Run: python scripts/bisect_compose.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend.image import build_pyramid
from orcvio_tpu.frontend.klt import forward_backward_track, pyr_track, track_level

H, W, N = 480, 752, 200
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
img1 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
xy = jnp.asarray(rng.uniform(30, 400, (N, 2)), jnp.float32)


def bench(tag, fn, *args, reps=50):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / reps * 1e6
    print(f"{tag:52s} {us:9.1f} us")
    return us


def main():
    pyr0 = tuple(build_pyramid(img0, 4))
    pyr1 = tuple(build_pyramid(img1, 4))
    pyr0 = jax.block_until_ready(jax.jit(lambda: pyr0)())
    pyr1 = jax.block_until_ready(jax.jit(lambda: pyr1)())

    bench("track_level L0 alone", lambda: track_level(img0, img1, xy, xy, 15, 10, 0.01))
    for lv in range(4):
        s = 2.0 ** lv
        bench(f"track_level L{lv} alone",
              lambda lv=lv, s=s: track_level(pyr0[lv], pyr1[lv], xy / s, xy / s, 15, 10, 0.01))
    bench("2x track_level L0 chained",
          lambda: track_level(img0, img1, xy,
                              track_level(img0, img1, xy, xy, 15, 10, 0.01)[0],
                              15, 10, 0.01))
    bench("pyr_track (4 levels)", lambda: pyr_track(pyr0, pyr1, xy, xy))
    bench("forward_backward_track", lambda: forward_backward_track(pyr0, pyr1, xy, xy))
    bench("build_pyramid", lambda: tuple(build_pyramid(img1, 4)))
    bench("fb + pyramid build",
          lambda: forward_backward_track(pyr0, tuple(build_pyramid(img1, 4)), xy, xy))


if __name__ == "__main__":
    main()
