"""Generate the committed binary-media fixture (VERDICT r6 item 4).

Writes ``fixtures/media.parquet`` — a genuine binary-payload table with
real PNG and WAV blobs built by the repo's own stdlib codecs
(`extensions/codecs.py`) — plus a small ``fixtures/media_files/`` raw
directory for `ingest_binary_dir` tests.  Fully deterministic: payloads
derive from integer arithmetic on the media_id, no RNG, so re-running
the generator reproduces byte-identical blobs (the parquet container may
differ in metadata ordering; the committed file is the fixture of
record and `tests/test_multimodal_fixture.py` pins its content hash).

Duplicate payloads are planted on purpose (ids 30/31 repeat id 0's PNG;
ids 62/63 repeat id 32's WAV) so digest-based exact dedup over the
fixture is a meaningful operation.

Run from the repo root: ``python tools/make_media_fixture.py``
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cubefs_hadoop_spark.extensions.codecs import png_encode, wav_encode

N_IMAGES = 32
N_AUDIO = 32
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")


def make_png(i: int) -> tuple[bytes, int, int]:
    """Deterministic small RGB image: size and pixel bytes derive from i."""
    w = 4 + (i % 5)
    h = 3 + (i % 4)
    rgb = bytes(
        (i * 37 + p * 11 + c * 101) % 256
        for p in range(w * h)
        for c in range(3)
    )
    return png_encode(w, h, rgb), w, h


def make_wav(i: int) -> tuple[bytes, int, int]:
    """Deterministic short mono clip: a pure integer-pattern waveform."""
    n = 16 + (i % 17)
    rate = 8000 + 1000 * (i % 3)
    samples = [(((i * 13 + k * 7) % 200) - 100) / 128.0 for k in range(n)]
    return wav_encode(samples, rate), n, rate


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    raw_dir = os.path.join(OUT, "media_files")
    os.makedirs(raw_dir, exist_ok=True)

    rows = []
    for i in range(N_IMAGES):
        src = 0 if i >= N_IMAGES - 2 else i  # planted duplicates 30,31
        payload, w, h = make_png(src)
        rows.append((i, "image", "image/png", w, h, None, None, payload))
    for j in range(N_AUDIO):
        i = N_IMAGES + j
        src = 0 if j >= N_AUDIO - 2 else j  # planted duplicates 62,63
        payload, n, rate = make_wav(src)
        rows.append((i, "audio", "audio/wav", None, None, n, rate, payload))

    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "modality": pa.array([r[1] for r in rows], pa.string()),
            "mime": pa.array([r[2] for r in rows], pa.string()),
            "width": pa.array([r[3] for r in rows], pa.int32()),
            "height": pa.array([r[4] for r in rows], pa.int32()),
            "n_samples": pa.array([r[5] for r in rows], pa.int32()),
            "sample_rate": pa.array([r[6] for r in rows], pa.int32()),
            "payload": pa.array([r[7] for r in rows], pa.binary()),
        }
    )
    pq.write_table(table, os.path.join(OUT, "media.parquet"),
                   compression="snappy")

    # a handful of raw files for ingest_binary_dir
    for i in (0, 1, 2):
        payload, _, _ = make_png(i)
        with open(os.path.join(raw_dir, f"img_{i:02d}.png"), "wb") as f:
            f.write(payload)
    for j in (0, 1, 2):
        payload, _, _ = make_wav(j)
        with open(os.path.join(raw_dir, f"snd_{j:02d}.wav"), "wb") as f:
            f.write(payload)

    print(f"wrote {len(rows)} rows to {OUT}/media.parquet and 6 raw files")


if __name__ == "__main__":
    main()
