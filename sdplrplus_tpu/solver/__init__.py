from .outer import sdplr, solve
