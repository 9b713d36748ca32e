"""Replay the Talos.walk.real dataset (reference examples/replay_datasets/)."""

from replay import main

if __name__ == "__main__":
    main("Talos.walk.real")
