from .rollout import eval_us, rollout_us, rollout_states

__all__ = ["eval_us", "rollout_us", "rollout_states"]
