from synchformer_tpu.config.core import Config, load_config, merge_cli_overrides  # noqa: F401
