from open_data_linter_spark.audio.codecs import (  # noqa: F401
    CODECS,
    CODEC_MAGIC,
    encode_clip,
    decode_clip,
    sniff_codec,
    snr_db,
)
