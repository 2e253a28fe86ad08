"""Animation: drive node trajectories from external files for re-simulation.

TPU-native re-design of ``app/anim/`` (reference ``Anim/FileAnim/
ReverseEgoAnim``, file_anim.py:12-99 — SURVEY.md §2.6 anim row).
"""
from .anim import Anim, FileAnim, ReverseEgoAnim, create_anim
