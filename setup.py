"""Package metadata (ref ``setup.py:1-7`` declares `snr_denoising`; this
framework is its TPU-native counterpart)."""
from setuptools import find_packages, setup

setup(
    name="diffusion_models_for_gravitational_waveform_reconstruction_tpu",
    version="0.1.0",
    description=("TPU-native JAX framework for conditional-diffusion "
                 "gravitational-waveform reconstruction"),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy", "h5py", "scipy"],
    entry_points={
        "console_scripts": [
            "gw-gen=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.gen:main",
            "gw-train=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.train:main",
            "gw-infer=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.infer:main",
            "gw-sweep=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.sweep:main",
            "gw-grid=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.grid:main",
            "gw-merge=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.merge:main",
            "gw-distill=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.distill:main",
            "gw-soup=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.soup:main",
            "gw-export=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.export:main",
            "gw-serve=diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.serve:main",
        ]
    },
)
