from runet_tpu.io.nifti import Volume, load_volume, save_volume  # noqa: F401
