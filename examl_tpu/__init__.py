"""examl-tpu: a TPU-native maximum-likelihood phylogenetic inference
framework with the capabilities of ExaML (RAxML search algorithm),
built on JAX/XLA/Pallas. See SURVEY.md for the blueprint."""

__version__ = '0.1.0'
