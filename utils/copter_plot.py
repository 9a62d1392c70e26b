#!/usr/bin/env python3
"""Trajectory-CSV dashboard for copter rollouts.

Reads the CSV format shared with the reference demos (header row
`t,m1..m4,<state names>`, one row per step — reference utils/copter-plot.py
consumes the same files) but is column-NAME driven rather than positional:
the header is parsed into named channels and the dashboard adapts to what
the file actually contains — altitude + climb rate + motors always, an
attitude panel when roll/pitch channels are present, and a ground-track
panel when x/y are present.  Headerless raw dumps are supported by
synthesizing the standard column names for the 9/15-column layouts.

Usage:
  python utils/copter_plot.py traj.csv [--save out.png] [--tmax S]
      [--panels altitude,motors] [--title T]
"""

import argparse
import csv as _csv
import sys

import numpy as np

# default sim rate used to synthesize a time axis for raw headerless files
# (gym_copter/envs/task.py:25)
DEFAULT_FPS = 100.0

# synthesized column names for headerless files, keyed by column count:
# 2D logs carry (m1,m2, y,dy,z,dz,phi,dphi); 3D logs carry four motors and
# the 10-dim lander observation (reference envs/lander.py:30-31)
RAW_LAYOUTS = {
    8: ['m1', 'm2', 'Y', 'dY', 'Z', 'dZ', 'Phi', 'dPhi'],
    14: ['m1', 'm2', 'm3', 'm4',
         'X', 'dX', 'Y', 'dY', 'Z', 'dZ', 'Phi', 'dPhi', 'Theta', 'dTheta'],
}


def read_trajectory(path):
    """Parse a trajectory CSV into {channel name: (T,) array}.

    Accepts headered files (first cell non-numeric) and raw headerless
    dumps (names synthesized from RAW_LAYOUTS, time axis from DEFAULT_FPS).
    """
    with open(path, newline='') as f:
        rows = list(_csv.reader(f))
    rows = [r for r in rows if r]
    if not rows:
        raise ValueError('empty CSV: %s' % path)

    def is_number(s):
        try:
            float(s)
            return True
        except ValueError:
            return False

    if is_number(rows[0][0]):
        names = None
        body = rows
    else:
        names = [c.strip() for c in rows[0]]
        body = rows[1:]

    data = np.array([[float(c) for c in r] for r in body])
    if names is None:
        layout = RAW_LAYOUTS.get(data.shape[1])
        if layout is None:
            raise ValueError(
                'headerless CSV with %d columns: expected one of %s'
                % (data.shape[1], sorted(RAW_LAYOUTS)))
        t = np.arange(len(data)) / DEFAULT_FPS
        channels = dict(zip(layout, data.T))
    else:
        channels = dict(zip(names, data.T))
        t = channels.pop('t', np.arange(len(data)) / DEFAULT_FPS)
    channels['t'] = t
    return channels


def _motor_names(ch):
    return sorted(n for n in ch if n.startswith('m') and n[1:].isdigit())


def available_panels(ch):
    """Which dashboard panels this file supports, in display order."""
    panels = []
    if 'Z' in ch:
        panels.append('altitude')
    if 'dZ' in ch:
        panels.append('climb')
    if 'Phi' in ch or 'Theta' in ch:
        panels.append('attitude')
    if 'X' in ch and 'Y' in ch:
        panels.append('track')
    if _motor_names(ch):
        panels.append('motors')
    return panels


def draw_panel(ax, name, ch):
    t = ch['t']
    if name == 'altitude':
        # stored Z is NED (down-positive); plot altitude above ground
        ax.plot(t, -ch['Z'], color='tab:blue')
        ax.axhline(0.0, color='0.7', lw=0.8)
        ax.set_ylabel('altitude (m)')
    elif name == 'climb':
        ax.plot(t, -ch['dZ'], color='tab:green')
        ax.axhline(0.0, color='0.7', lw=0.8)
        ax.set_ylabel('climb rate (m/s)')
    elif name == 'attitude':
        for key, label in (('Phi', 'roll'), ('Theta', 'pitch')):
            if key in ch:
                ax.plot(t, np.degrees(ch[key]), label=label)
        ax.set_ylabel('attitude (deg)')
        ax.legend(loc='upper right', fontsize=8)
    elif name == 'track':
        ax.plot(ch['X'], ch['Y'], color='tab:purple')
        ax.plot(ch['X'][0], ch['Y'][0], 'o', color='tab:purple', ms=4)
        ax.set_ylabel('Y (m)')
        ax.set_xlabel('X (m)')
        ax.set_aspect('equal', adjustable='datalim')
    elif name == 'motors':
        for m in _motor_names(ch):
            ax.plot(t, ch[m], label=m, lw=0.9)
        ax.set_ylabel('motor command')
        ax.set_ylim(-0.05, 1.05)
        ax.legend(loc='upper right', fontsize=8, ncol=2)
    else:
        raise ValueError('unknown panel %r' % name)


def plot_dashboard(ch, panels=None, title=None, tmax=None):
    import matplotlib.pyplot as plt

    panels = panels or available_panels(ch)
    fig, axes = plt.subplots(len(panels), 1,
                             figsize=(8, 2.0 * len(panels)),
                             constrained_layout=True, squeeze=False)
    for ax, name in zip(axes[:, 0], panels):
        draw_panel(ax, name, ch)
        if name != 'track':
            ax.set_xlim(0, tmax if tmax is not None else ch['t'][-1])
            ax.set_xlabel('time (s)')
    if title:
        fig.suptitle(title)
    return fig


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('csvfile', help='trajectory CSV (headered or raw)')
    p.add_argument('--panels', default=None,
                   help='comma-separated subset of: altitude, climb, '
                        'attitude, track, motors (default: all available)')
    p.add_argument('--title', default=None)
    p.add_argument('--tmax', type=float, default=None,
                   help='time-axis limit in seconds (default: data length)')
    p.add_argument('--save', default=None,
                   help='write the figure to this file instead of showing')
    args = p.parse_args(argv)

    import matplotlib
    if args.save:
        matplotlib.use('Agg')

    try:
        ch = read_trajectory(args.csvfile)
    except (OSError, ValueError) as e:
        sys.exit('cannot read %s: %s' % (args.csvfile, e))

    panels = args.panels.split(',') if args.panels else None
    fig = plot_dashboard(ch, panels=panels,
                         title=args.title or args.csvfile, tmax=args.tmax)
    if args.save:
        fig.savefig(args.save, dpi=110)
        print('saved', args.save)
    else:
        import matplotlib.pyplot as plt
        plt.show()


if __name__ == '__main__':
    main()
