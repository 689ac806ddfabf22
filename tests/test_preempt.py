"""DD-PPO preemption counter store round-trip."""

from ppo_tpu.parallel.preempt import TCPStoreClient, TCPStoreServer, should_preempt


def test_tcp_store_counter():
    srv = TCPStoreServer()
    c1 = TCPStoreClient("127.0.0.1", srv.port)
    c2 = TCPStoreClient("127.0.0.1", srv.port)
    assert c1.get() == 0
    assert c1.increment() == 1
    assert c2.increment() == 2
    assert c2.get() == 2
    assert not should_preempt(c1, num_peers=4, threshold=0.6)
    assert c1.increment() == 3
    assert should_preempt(c1, num_peers=4, threshold=0.6)
    assert c1.reset() == 0
    assert c2.get() == 0
    c1.close(); c2.close(); srv.close()
