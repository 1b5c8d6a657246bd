"""Multimodal columns (beyond-reference, BASELINE.json north star).

Media as data: image/audio/video payloads are opaque ``binary`` columns
with a typed metadata struct alongside — the schema a 100 TB training-data
lake uses (payload stays columnar, metadata prunes without touching bytes).

Everything Spark-side is real: schemas, partitioning, Arrow batch shapes,
``mapInPandas`` signatures. The codec boundary (actual JPEG/PCM/H.264
decode) is NOT real — the container ships no image/audio libraries — so
decode kernels run a clearly-marked deterministic fake derived from the
payload bytes (see ``media.FAKE_DECODE_NOTE``), with the real library
drop-in point isolated to one function per modality.
"""

from ram_datapipeline_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    audio_frame_energy,
    decode_image_stats,
    decode_png_stats,
    decode_wav_stats,
    encode_pcm8_wav,
    payload_embedding,
    payload_embedding_long,
    resize_images,
    sample_frames,
    synthesize_media,
)
