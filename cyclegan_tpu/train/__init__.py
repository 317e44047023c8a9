"""Training systems (reference layer L4/L5 — SURVEY.md §1).

The reference's ``model.py`` trainers become functional, jitted train steps:
:mod:`cyclegan_tpu.train.supervised` and :mod:`cyclegan_tpu.train.cyclegan`.
Support components: losses, LambdaLR-equivalent optax schedule, functional
image pool, confusion-matrix metrics, Orbax checkpointing.
"""
