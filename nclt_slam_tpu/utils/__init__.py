from nclt_slam_tpu.utils.profiling import RateCounter, profile_trace, rollout_stats

__all__ = ["RateCounter", "profile_trace", "rollout_stats"]
