from . import hdf5io, pipeline, synth  # noqa: F401
