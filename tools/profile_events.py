#!/usr/bin/env python3
"""Parse a Spark event log: per-job wall, gaps between jobs, per-stage
task-count/max-task share — the single-task-stage detector."""
import json, sys, collections

def main(path):
    jobs = {}
    stages = {}
    app_start = app_end = None
    for line in open(path):
        try: e = json.loads(line)
        except Exception: continue
        ev = e.get('Event')
        if ev == 'SparkListenerJobStart':
            jobs[e['Job ID']] = {'t0': e['Submission Time'], 't1': None,
                'desc': (e.get('Properties') or {}).get('spark.job.description',''),
                'stages': [s['Stage ID'] for s in e.get('Stage Infos',[])]}
        elif ev == 'SparkListenerJobEnd':
            if e['Job ID'] in jobs: jobs[e['Job ID']]['t1'] = e['Completion Time']
        elif ev == 'SparkListenerStageCompleted':
            si = e['Stage Info']
            t0, t1 = si.get('Submission Time'), si.get('Completion Time')
            stages[si['Stage ID']] = {'name': si['Stage Name'], 'n': si['Number of Tasks'],
                'wall': (t1-t0) if t0 and t1 else 0}
    if not jobs: print('no jobs'); return
    order = sorted(jobs.items(), key=lambda kv: kv[1]['t0'])
    tmin = order[0][1]['t0']; tmax = max(j['t1'] or j['t0'] for _,j in order)
    print(f'total window {(tmax-tmin)/1000:.2f}s, {len(jobs)} jobs, {len(stages)} stages')
    prev_end = tmin
    for jid, j in order:
        gap = j['t0'] - prev_end
        wall = (j['t1']-j['t0'])/1000 if j['t1'] else -1
        st = ' '.join(f"s{sid}({stages[sid]['n']}t,{stages[sid]['wall']/1000:.2f}s)"
                      for sid in j['stages'] if sid in stages)
        print(f"  job {jid:3d} gap {gap/1000:6.2f}s wall {wall:6.2f}s  {j['desc'][:40]:40} {st}")
        prev_end = j['t1'] or j['t0']
    # single-task heavy stages
    hot = sorted((s for s in stages.values() if s['n']<=2 and s['wall']>200),
                 key=lambda s:-s['wall'])[:15]
    if hot:
        print('\nNARROW HOT STAGES (<=2 tasks, >0.2s):')
        for s in hot: print(f"  {s['wall']/1000:6.2f}s n={s['n']}  {s['name'][:90]}")
if __name__ == '__main__': main(sys.argv[1])
