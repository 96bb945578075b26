"""End-to-end pipeline stages: audio front-end, landmark prediction, render.

Replaces the reference's filesystem-and-subprocess plumbing
(`main_end2end_module2.py`) with in-memory arrays and explicit stage APIs.
"""
