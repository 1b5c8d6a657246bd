"""Multimodal columns (beyond-reference, BASELINE.json north star).

Media as data: image/audio/video payloads are opaque ``binary`` columns
with a typed metadata struct alongside — the schema a 100 TB training-data
lake uses (payload stays columnar, metadata prunes without touching bytes).

Everything Spark-side is real: schemas, partitioning, Arrow batch shapes,
``mapInPandas`` signatures. Codec reality (no image/audio libraries ship in this container):
WAV (RIFF/WAVE encode+decode, stdlib ``wave``), PNG (full encode +
five-filter decode + real nearest-neighbor resize, stdlib ``zlib``), and
baseline JPEG (markers + Annex-K Huffman + DCT, ``jpeg.py`` — lossy, but
provably lossless on the DC-only class its oracle gate uses) are REAL
end-to-end paths. Only the generic any-format kernels
(``_decode_image_batch``, ``resize_images``'s byte transform — e.g.
JPEG/H.264) remain clearly-marked deterministic stand-ins (see
``media.FAKE_DECODE_NOTE``), with the library drop-in point isolated to
one function per modality.
"""

from ram_datapipeline_spark.multimodal.jpeg import (  # noqa: F401
    decode_jpeg_bytes,
    decode_jpeg_stats,
    encode_flat_jpeg_media,
    encode_gray_jpeg,
)
from ram_datapipeline_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    audio_frame_energy,
    decode_image_stats,
    decode_png_stats,
    decode_wav_stats,
    encode_gray8_png_media,
    encode_pcm8_wav,
    payload_embedding,
    payload_embedding_long,
    resize_images,
    resize_png_images,
    sample_frames,
    synthesize_media,
)
