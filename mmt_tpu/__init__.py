"""mmt_tpu: TPU-native multi-modal transformer retrieval framework."""

__version__ = "0.1.0"
