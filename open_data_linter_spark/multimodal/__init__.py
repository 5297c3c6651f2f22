from open_data_linter_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    media_features,
    frame_sample,
    audio_features,
    audio_feature_drift,
    chunk_audio,
    resample_pcm,
    segment_on_silence,
    transform_audio,
)
