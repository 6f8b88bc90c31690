from .synthetic import (  # noqa: F401
    default_object_pose,
    SyntheticFrame,
    SyntheticSequenceConfig,
    generate_sequence,
    hand_base_for_grasp,
    render_frame,
    render_frame_fast,
)
