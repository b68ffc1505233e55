from kinfu_tpu.eval.ate import ate_rmse, rpe_rmse, align_umeyama  # noqa: F401
