from kinfu_tpu.pipeline.state import KinFuState, StepOutput  # noqa: F401
from kinfu_tpu.pipeline.kinfu import init_state, kinfu_step, make_step_fn  # noqa: F401
from kinfu_tpu.pipeline.session import KinFuSession  # noqa: F401
from kinfu_tpu.pipeline.render import render_phong, render_normals  # noqa: F401
