from simulst_tpu.losses import label_smoothed_ce, joint_ctc  # noqa: F401
