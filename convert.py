#!/usr/bin/env python
"""COLMAP preprocessing wrapper.

Surface of /root/reference/convert.py:35-122: feature_extractor →
exhaustive_matcher → mapper → image_undistorter against external `colmap`,
sparse/0 layout fixup, optional ×½/¼/⅛ downscales (PIL instead of
ImageMagick).
"""

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd))
    rc = subprocess.run(cmd).returncode
    if rc != 0:
        print(f"command failed with code {rc}. Exiting.")
        sys.exit(rc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source_path", "-s", required=True)
    ap.add_argument("--no_gpu", action="store_true")
    ap.add_argument("--skip_matching", action="store_true")
    ap.add_argument("--camera", default="OPENCV")
    ap.add_argument("--colmap_executable", default="")
    ap.add_argument("--resize", action="store_true")
    args = ap.parse_args()

    colmap = args.colmap_executable or "colmap"
    if shutil.which(colmap) is None:
        print("error: COLMAP binary not found on PATH — install COLMAP or "
              "pass --colmap_executable")
        sys.exit(1)
    use_gpu = "0" if args.no_gpu else "1"
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", f"{src}/distorted/database.db",
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--output_path", f"{src}/distorted/sparse",
             "--Mapper.ba_global_function_tolerance=0.000001"])

    run([colmap, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src, "--output_type", "COLMAP"])

    # move sparse/* into sparse/0 (reference convert.py:80-88)
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f == "0":
            continue
        shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))

    if args.resize:
        from PIL import Image
        for factor, name in ((2, "images_2"), (4, "images_4"),
                             (8, "images_8")):
            dst = os.path.join(src, name)
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(os.path.join(src, "images")):
                with Image.open(os.path.join(src, "images", fn)) as im:
                    out = im.resize((im.width // factor,
                                     im.height // factor))
                    # high-quality JPEG re-encode: PIL's default q75
                    # bakes compression artifacts into every downscaled
                    # training image (magick mogrify re-encodes near the
                    # input quality)
                    if fn.lower().endswith((".jpg", ".jpeg")):
                        out.save(os.path.join(dst, fn), quality=95,
                                 subsampling=0)
                    else:
                        out.save(os.path.join(dst, fn))
    print("Done.")


if __name__ == "__main__":
    main()
