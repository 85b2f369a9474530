from smirk_tpu.render import camera, geometry  # noqa: F401
