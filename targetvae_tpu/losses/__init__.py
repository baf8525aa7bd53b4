from .elbo import compute_elbo
from .likelihoods import reconstruction_log_prob

__all__ = ["compute_elbo", "reconstruction_log_prob"]
