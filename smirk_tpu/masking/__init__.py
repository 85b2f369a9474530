from smirk_tpu.masking.masking import (  # noqa: F401
    compose_mask,
    face_sampling_probabilities,
    interpolate_on_faces,
    points_to_pixels,
    random_barycentric,
    sample_mesh_points,
    transfer_pixels,
    triangle_area_xy,
)
