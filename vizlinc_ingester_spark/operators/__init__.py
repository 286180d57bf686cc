"""Operators (SURVEY.md §2): each is a pure ``DataFrame -> DataFrame``
function, declarative DataFrame/SQL only, designed so Catalyst keeps
filters pushed down and joins broadcast/shuffle-planned as appropriate.
"""
