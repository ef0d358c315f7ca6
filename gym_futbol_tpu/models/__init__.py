from .policy import ActorCritic, sample_actions

__all__ = ["ActorCritic", "sample_actions"]
