"""Random-rollout demo with GUI render — counterpart of the reference's
``test_env.py`` smoke script (test_env.py:1-25)."""

import sys
import time

sys.path.insert(0, '..')

from marlsnake_tpu.envs.wrappers import RenderGUI, make_snake

env, obs_shape, action_shape, properties = make_snake(
    num_envs=1,
    num_snakes=4,
    height=20,
    width=20,
    snake_length=5,
    vision_range=5,
)

env = RenderGUI(env)  # cv2 window when a display exists, headless otherwise

obs = env.reset()
done = [False] * properties['num_snakes']

while not all(done):
    env.render()
    actions = [env.action_space.sample() % 3
               for _ in range(properties['num_snakes'])]
    obs, rewards, done, infos = env.step(actions)
    print('rewards =', rewards)
    time.sleep(0.05)

env.close()
