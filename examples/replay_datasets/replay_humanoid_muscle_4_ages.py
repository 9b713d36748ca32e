"""Replay the HumanoidMuscle4Ages.walk.all.real dataset (reference examples/replay_datasets/)."""

from replay import main

if __name__ == "__main__":
    main("HumanoidMuscle4Ages.walk.all.real")
