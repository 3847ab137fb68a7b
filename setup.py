"""Package metadata for mmt_tpu."""

from setuptools import find_packages, setup

setup(
    name="mmt_tpu",
    version="0.1.0",
    description=("TPU-native multi-modal transformer framework for "
                 "video-text retrieval"),
    packages=find_packages(include=["mmt_tpu", "mmt_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy", "h5py"],
    extras_require={"test": ["pytest", "scipy", "torch", "transformers"]},
)
