#!/usr/bin/env python
"""Validate the pixel-level media backends end-to-end when a codec library
is present (mirror of scripts/validate_iceberg.py for the Iceberg runtime).

The engine's metadata path (decode_images, extract_features) is real and
oracle-checked in every environment; ``resize_images(fake=False)`` and
``frame_sample(fake=False)`` need an actual codec backend (PIL). This
sandbox ships none, so here the script must exit 0 with a SKIP. On a host
with PIL it:

1. synthesizes fully-decodable images WITH PIL itself (PNG/GIF/BMP/JPEG,
   sizes straddling max_side), runs ``resize_images(fake=False,
   max_side=48)``, and asserts every output's bytes REALLY decode to the
   computed (target_width, target_height) — not just that the arithmetic
   is right. (The committed ``fixtures/media_small`` blobs are header-only
   — real signatures + dimension headers but no pixel payload, by design:
   they pin the pure-header parser oracle. PIL can open their headers but
   cannot load pixels, so they CANNOT validate the resize path; step 3
   checks they degrade to NULLs instead of crashing it.)
2. builds a 7-frame animated GIF, runs ``frame_sample(fake=False,
   every_n=3)``, and asserts frame indices {0, 3, 6} with distinct
   per-frame content hashes.
3. runs the real backend over the committed header-only fixture and
   asserts every row comes back (target NULLs for pixel-less blobs), i.e.
   undecodable payloads degrade per-row rather than failing the stage.

Usage: python scripts/validate_media_backends.py
"""

from __future__ import annotations

import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    try:
        from PIL import Image
    except ImportError:
        print(
            "SKIP: PIL not importable — pixel backends cannot run in this "
            "environment (metadata decode path is oracle-checked regardless)",
            file=sys.stderr,
        )
        return 0

    from spaczz_spark.operators.multimodal import frame_sample, resize_images
    from spaczz_spark.plans.pipeline import recommended_session

    spark = recommended_session(
        app="validate-media", master="local[4]", shuffle_partitions=4
    )
    try:
        # -- 1. resize over PIL-generated, fully-decodable images -----------
        import random

        rng = random.Random(42)
        synth = []
        truth = {}
        for i in range(12):
            fmt = ["PNG", "GIF", "BMP", "JPEG"][i % 4]
            # straddle max_side=48: some need downscale, some pass through
            w, h = rng.randint(8, 160), rng.randint(8, 160)
            img = Image.new("RGB", (w, h), (i * 20 % 256, 64, 255 - i * 15))
            buf = io.BytesIO()
            img.save(buf, format=fmt)
            synth.append((i, bytearray(buf.getvalue())))
            truth[i] = (fmt, w, h)
        synth_df = spark.createDataFrame(synth, ["media_id", "data"])
        resized = resize_images(synth_df, max_side=48).collect()
        n_checked = 0
        for r in resized:
            fmt, w, h = truth[r["media_id"]]
            scale = min(1.0, 48 / max(w, h))
            assert r["target_width"] == max(1, round(w * scale)), r
            assert r["target_height"] == max(1, round(h * scale)), r
            img = Image.open(io.BytesIO(bytes(r["data"])))
            assert img.size == (r["target_width"], r["target_height"]), (
                img.size, r["target_width"], r["target_height"])
            n_checked += 1
        assert n_checked >= 10, f"only {n_checked} decodable images"

        frames = []
        for i in range(7):
            frames.append(Image.new("RGB", (16, 16), (i * 30, 0, 255 - i * 30)))
        buf = io.BytesIO()
        frames[0].save(
            buf, format="GIF", save_all=True, append_images=frames[1:],
            duration=100,
        )
        gif = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], ["media_id", "data"]
        )
        sampled = frame_sample(gif, every_n=3).collect()
        idxs = sorted(r["frame_idx"] for r in sampled)
        assert idxs == [0, 3, 6], idxs
        hashes = {r["frame_sha256"] for r in sampled}
        assert len(hashes) == 3, "sampled frames must have distinct content"

        # -- 3. header-only committed fixture degrades per-row, no crash ----
        media = spark.read.parquet(
            os.path.join(REPO, "fixtures", "media_small", "media.parquet")
        )
        fixture_rows = resize_images(media, max_side=48).collect()
        assert len(fixture_rows) == media.count(), "no rows may be dropped"
        # every blob lacks pixel payload (or is corrupt), so the backend
        # must mark it undecodable rather than fail the stage
        assert all(r["target_width"] is None for r in fixture_rows), (
            "header-only blobs must degrade to NULL targets"
        )

        print(f"media backends validated: {n_checked} resizes + gif frame "
              "sampling + header-only degrade")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
