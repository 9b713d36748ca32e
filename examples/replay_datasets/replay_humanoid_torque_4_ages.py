"""Replay the HumanoidTorque4Ages.walk.all.real dataset (reference examples/replay_datasets/)."""

from replay import main

if __name__ == "__main__":
    main("HumanoidTorque4Ages.walk.all.real")
