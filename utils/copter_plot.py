#!/usr/bin/env python3
"""Plot altitude, vertical speed, and motor commands from a trajectory CSV.

Offline-analysis parity with the reference's utils/copter-plot.py:18-88:
accepts both headered CSVs written by the demo scripts (9 columns for 2D,
15 for 3D) and raw headerless dumps, plots -Z, -dZ/dt (NED negated), and
the motor traces against time.
"""

import argparse
from argparse import ArgumentDefaultsHelpFormatter

import numpy as np

FRAMES_PER_SECOND = 100  # gym_copter/envs/task.py:25


def load(csvfile):
    data = np.genfromtxt(csvfile, delimiter=',')
    cols = data.shape[1]
    is3d = cols > 9
    if cols in (9, 15):
        # headered file: first row is names, first column is time
        t = data[1:, 0]
        body = data[1:, 1:]
    else:
        n = data.shape[0]
        t = np.linspace(0, n / FRAMES_PER_SECOND, n)
        body = data
    return t, body, is3d


def main():
    parser = argparse.ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument('csvfile', metavar='CSVFILE', help='input .csv file')
    parser.add_argument('--title', default=None,
                        help='Figure title (defaults to filename)')
    parser.add_argument('--time', type=float, default=8,
                        help='Time axis limit')
    parser.add_argument('--dzlim', type=float, default=15,
                        help='Axis limit for dZ/dt')
    parser.add_argument('--save', default=None,
                        help='Save figure to file instead of showing')
    args = parser.parse_args()

    import matplotlib
    if args.save:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    try:
        t, body, is3d = load(args.csvfile)
    except Exception as e:
        raise SystemExit('Unable to open file %s: %s' % (args.csvfile, e))

    n_motors = 4 if is3d else 2
    zcol = 8 if is3d else 4  # after the motor columns: Z slot in obs
    z, dz = body[:, zcol], body[:, zcol + 1]

    fig, axs = plt.subplots(3, 1, constrained_layout=True)
    fig.suptitle(args.title or args.csvfile, fontsize=16)

    axs[0].plot(t, -z)
    axs[0].set_ylabel('Z (m)')

    axs[1].plot(t, -dz)
    axs[1].set_ylim((-args.dzlim, 0))
    axs[1].set_ylabel('dZ/dt (m/s)')

    for k in range(n_motors):
        axs[2].plot(t, body[:, k])
    axs[2].set_ylabel('Motors')
    axs[2].set_ylim((0, 1))
    axs[2].legend(['m%d' % (k + 1) for k in range(n_motors)])
    axs[2].set_xlabel('Time (s)')

    for ax in axs:
        ax.set_xlim((0, args.time))

    if args.save:
        fig.savefig(args.save, dpi=100)
        print('saved', args.save)
    else:
        plt.show()


if __name__ == '__main__':
    main()
