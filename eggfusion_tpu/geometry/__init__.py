from eggfusion_tpu.geometry import lie, camera, sh, transforms  # noqa: F401
