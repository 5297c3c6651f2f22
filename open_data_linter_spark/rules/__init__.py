from open_data_linter_spark.rules.audio_rules import build_audio_ruleset  # noqa: F401
