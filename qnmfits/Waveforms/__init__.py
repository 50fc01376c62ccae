"""Alias of the reference's Waveforms package (empty __init__ there
too; users import the submodules directly)."""
