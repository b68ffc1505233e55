from kinfu_tpu.tracking.icp import icp_step, rigid_icp, ICPResult  # noqa: F401
