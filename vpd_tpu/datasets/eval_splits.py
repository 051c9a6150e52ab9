"""Held-out test video prefixes (parity: `action_dataset/eval.py:4-43`)."""

# Hold out all videos from 2018 events
FS_TEST_PREFIXES = (
    'men_olympic_short_program_2018',
    'men_world_short_program_2018',
    'women_olympic_short_program_2018',
    'women_world_short_program_2018',
)

# Hold out by match video
TENNIS_TEST_PREFIXES = (
    'usopen_2015_mens_final_federer_djokovic',
    'usopen_2019_womens_osaka_gauff',
    'wimbledon_2019_mens_semifinal_federer_nadal',
    'wimbledon_2019_womens_final_halep_williams',
)


def _get_tennis_prefixes(video_list):
    return tuple('{}{}'.format(x, y) for x in ['', 'front__', 'back__']
                 for y in video_list)


def get_test_prefixes(dataset):
    if dataset.startswith('fs'):
        return FS_TEST_PREFIXES
    elif dataset.startswith('tennis'):
        return _get_tennis_prefixes(TENNIS_TEST_PREFIXES)
    raise NotImplementedError('Unknown dataset: {}'.format(dataset))
