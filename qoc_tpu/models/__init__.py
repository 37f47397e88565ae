from . import costs, dressed, forward, gates, operators, system
