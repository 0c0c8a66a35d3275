#!/usr/bin/env python
"""Render the Cornell box to a PPM — the reference's canonical workload
(scripts/run.sh there), in a few lines here.

    python examples/render_cornell.py [out.ppm]
"""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import esctp1raytracer_tpu as rt


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "cornell.ppm"
    scene = rt.cornell_box()
    cam = rt.Camera.look_at((0, 1, 2), (0, 1, 0), vfov=60.0, aspect=1024 / 768)
    img = rt.render(scene, cam, 1024, 768, rt.RenderConfig(backend="mxu"))
    rt.write_ppm(out, np.asarray(img))
    print(f"Rendered image in: {out}")


if __name__ == "__main__":
    main()
